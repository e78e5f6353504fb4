package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Classifier

/** Ground-truth tests for the batch-perceptron classifier on a
  * hand-computable linearly-separable corpus. */
class ClassifierSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  /** Separable by construction: en vocabulary {sigma, kappa} is disjoint
    * from de vocabulary {lambda, zeta} (buckets 7/34/39/53 — verified
    * collision-free in the 64-bucket hash space), plus one ZERO-TOKEN en doc that
    * can only be carried by the bias. Epoch-1 weights (all docs train
    * from w=0): sigma +4, kappa +2, lambda −2, zeta −4, bias +1 — which
    * already classifies everything, so epochs 2 and 3 are no-ops. */
  lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-clf").toString
    Seq(
      (0L, "sigma sigma kappa", "en", "srcA", 16L),
      (1L, "sigma sigma kappa", "en", "srcA", 16L),
      (2L, "lambda zeta zeta", "de", "srcB", 17L),
      (3L, "lambda zeta zeta", "de", "srcB", 17L),
      (4L, "", "en", "srcA", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("perceptron separates disjoint vocabularies; zero-token doc rides the bias; converged epochs are no-ops") {
    val rows = Classifier.taQualityClf(spark, dir).collect()
    assert(rows.length == 5)
    val m = rows.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getInt(3), r.getBoolean(4))).toMap
    // epoch-1 hand computation: w = Σ y·x over ALL docs (margin 0 ⇒
    // everything trains), b = Σ y = +1; no epoch-2 misclassifications
    assert(m(0L) == ((1L, 11L, 1, true)), s"en doc: ${m(0L)}") // 2·4 + 1·2 + 1
    assert(m(1L) == ((1L, 11L, 1, true)))
    assert(m(2L) == ((-1L, -9L, -1, true)), s"de doc: ${m(2L)}") // −2 − 8 + 1
    assert(m(3L) == ((-1L, -9L, -1, true)))
    // the empty doc scores the bias alone — and is classified by it
    assert(m(4L) == ((1L, 1L, 1, true)), s"empty doc: ${m(4L)}")
    // convergence: epoch 1 already separates, so 1 and 3 epochs agree
    val one = Classifier.taQualityClfWith(spark, dir, epochs = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    rows.foreach(r => assert(one(r.getLong(0)) == r.getLong(2)))
  }

  test("training is deterministic and leaves nothing persisted") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val a = Classifier.taQualityClf(spark, dir).collect().toSet
    val b = Classifier.taQualityClf(spark, dir).collect().toSet
    assert(a == b)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"persisted RDDs leaked past training: $leaked")
  }

  test("stored model round-trips through parquet and scores new docs without retraining") {
    val mdir = java.nio.file.Files.createTempDirectory("graft-clf-model").toString
    Classifier.taQualityClfModel(spark, dir)
      .write.mode("overwrite").parquet(s"$mdir/model.parquet")
    val model = spark.read.parquet(s"$mdir/model.parquet")
    // scoring the training corpus under the stored model reproduces the
    // in-process training scores exactly
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val over = Classifier.taQualityClfScoreOver(docs, model).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    Classifier.taQualityClf(spark, dir).collect().foreach { r =>
      assert(over(r.getLong(0)) == ((r.getLong(2), r.getInt(3))),
        s"doc ${r.getLong(0)} diverges under the stored model")
    }
    // an UNSEEN doc scores under the hashing-trick contract: its known
    // tokens hit trained buckets, its novel token hits an untrained one
    val fresh = Seq((100L, "sigma nu", "xx", "s", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val f = Classifier.taQualityClfScoreOver(fresh, model).collect()
    assert(f.length == 1)
    // sigma carries +4, nu's bucket was never trained (weight 0 — nu is
    // not in the training vocabulary and 64 buckets leave it alone),
    // bias +1 → score 5, pred +1
    assert((f(0).getLong(1), f(0).getInt(2)) == ((5L, 1)), s"got ${f(0)}")
  }

  test("pipeline_scored carries exactly the capstone's survivors with the classifier's own scores") {
    import graft.operators.Pipeline
    val sf = "/root/testdata/sf0.001"
    val ps = Pipeline.pipelineScored(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(4), r.getInt(5))).toMap
    val survivors = Pipeline.pipelineFull(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ps.keySet == survivors, "join adds or drops no survivor")
    val clf = Classifier.taQualityClf(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getInt(3))).toMap
    ps.foreach { case (id, sc) => assert(clf(id) == sc, s"doc $id score drift") }
  }

  test("on a NON-separable corpus the model still scores every doc deterministically") {
    val d = java.nio.file.Files.createTempDirectory("graft-clf2").toString
    // identical text, opposite labels — no linear separator exists
    Seq((0L, "omega omega", "en", "s", 11L), (1L, "omega omega", "de", "s", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = Classifier.taQualityClf(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getBoolean(4))).sortBy(_._1)
    assert(rows.length == 2)
    // symmetric gradients cancel: weights and bias stay 0 through every
    // epoch, both docs score 0, and the tie rule calls both wrong
    assert(rows.toSeq == Seq((0L, 0L, false), (1L, 0L, false)))
  }

  test("calibration card: bands reconcile with the member operators and the lenses measurably differ") {
    import graft.operators.TextAnalysis
    val sf = "/root/testdata/sf0.001"
    val card = Classifier.taQualityCalibration(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(card.size >= 3, s"banding too coarse: ${card.keys}")
    // reconcile against a driver-side recount from the members
    val clf = Classifier.taQualityClf(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val pass = TextAnalysis.taGopherRules(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getInt(r.fieldIndex("passes"))).toMap
    val w = Classifier.CalibBandWidth; val off = Classifier.CalibOffset
    val want = clf.toSeq.map { case (id, (lab, sc)) =>
      ((sc + off) / w - off / w, lab, pass(id))
    }.groupBy(_._1).map { case (b, xs) =>
      b -> ((xs.size.toLong, xs.count(_._3 == 1).toLong, xs.count(_._2 == 1L).toLong))
    }
    for ((b, (n, np, nhq)) <- want) {
      val (gn, gnp, _, gnhq, _) = card(b)
      assert((gn, gnp, gnhq) == ((n, np, nhq)), s"band $b mismatch")
    }
    // the card is non-trivial: pass rates differ across bands
    assert(card.values.map(_._3).toSet.size > 1,
      "all bands share one pass rate — the card pins nothing")
  }
}
