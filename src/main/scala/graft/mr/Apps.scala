package graft.mr

/** The reference's eight map/reduce applications (SURVEY.md §2.2),
  * re-expressed as Scala (Map, Reduce) pairs for the compat layer.
  * The four with data semantics are here; the other four (jobcount,
  * mtiming, rtiming, crash-injection) probe harness behavior, not data
  * — their intent is covered by property/chaos tests instead.
  */
object Apps {

  /** Letter-run tokenizer: splits on every non-letter rune, exactly the
    * reference's `strings.FieldsFunc(contents, !unicode.IsLetter)`
    * (`mrapps/wc.go:19-27`). Java's \p{L} matches Go's unicode.IsLetter
    * on the letter categories (Lu/Ll/Lt/Lm/Lo). FieldsFunc never yields
    * empty tokens, hence the nonEmpty filter. */
  def tokenize(contents: String): Seq[String] =
    contents.split("[^\\p{L}]+").toSeq.filter(_.nonEmpty)

  /** wc — word count (`mrapps/wc.go:19-40`): emit (word,"1") per
    * occurrence; reduce = occurrence count. Case-sensitive. */
  val wcMap: MRJob.MapF = (_, contents) => tokenize(contents).map(_ -> "1")
  val wcReduce: MRJob.ReduceF = (_, values) => values.size.toString

  /** indexer — inverted index (`mrapps/indexer.go:20-39`): per-document
    * DISTINCT words → (word, docname); reduce = "<n> <docs sorted,comma>". */
  val indexerMap: MRJob.MapF = (name, contents) =>
    tokenize(contents).distinct.map(_ -> name)
  val indexerReduce: MRJob.ReduceF = (_, values) =>
    s"${values.size} ${values.sorted.mkString(",")}"

  /** early_exit — per-file counter (`mrapps/early_exit.go:19-36`),
    * minus the sleep fault-injection (harness probe, not semantics). */
  val perFileMap: MRJob.MapF = (name, _) => Seq(name -> "1")
  val perFileReduce: MRJob.ReduceF = (_, values) => values.size.toString

  /** crash/nocrash — file-metadata app (`mrapps/nocrash.go:26-47`):
    * emit ("a",filename), ("b",len(filename)), ("c",len(contents)),
    * ("d","xyzzy") per file; reduce = values sorted, space-joined.
    * Fault injection (`mrapps/crash.go:20-32`) maps to Spark task-retry
    * chaos testing, not to an operator. */
  // Go len(string) counts UTF-8 BYTES; Scala String.length counts
  // UTF-16 code units — they differ on any non-ASCII input ("héllo" is
  // 6 bytes but 5 code units), so byte-compat requires getBytes
  val metadataMap: MRJob.MapF = (name, contents) => Seq(
    "a" -> name,
    "b" -> name.getBytes("UTF-8").length.toString,
    "c" -> contents.getBytes("UTF-8").length.toString,
    "d" -> "xyzzy")
  val metadataReduce: MRJob.ReduceF = (_, values) =>
    values.sorted.mkString(" ")
}
