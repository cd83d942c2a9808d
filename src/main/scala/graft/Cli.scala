package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Command-line entry point — parity with the reference CLI
  * (/root/reference/src/cli.ts:207-283): JSONL in, pipeline JSON, JSONL out,
  * with `--explain` and `--stats`.
  *
  * Usage:
  *   graft.Cli --pipeline '<json>' [--in path[.jsonl|.parquet]] [--out path]
  *             [--collection name=path ...] [--explain] [--stats] [--pretty]
  *             [--preserve-missing]
  *
  * `--in -` (default) reads JSONL from stdin; `--out -` (default) writes
  * JSONL to stdout. Parquet is selected by file extension.
  * `--preserve-missing` tracks per-document field presence on JSONL inputs
  * so `$exists` distinguishes `{a: null}` from `{}` (reference
  * hasOwnProperty semantics — see Aggo.fromJSONL).
  */
object Cli {

  def main(args: Array[String]): Unit = {
    var pipeline: Option[String] = None
    var in = "-"
    var out = "-"
    var explain = false
    var stats = false
    var pretty = false
    var preserveMissing = false
    var collections = Map.empty[String, String]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--pipeline"      => pipeline = Some(args(i + 1)); i += 2
        case "--pipeline-file" => pipeline = Some(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(args(i + 1))))); i += 2
        case "--in"            => in = args(i + 1); i += 2
        case "--out"           => out = args(i + 1); i += 2
        case "--collection"    =>
          val Array(n, p) = args(i + 1).split("=", 2); collections += n -> p; i += 2
        case "--explain"          => explain = true; i += 1
        case "--stats"            => stats = true; i += 1
        case "--pretty"           => pretty = true; i += 1
        case "--preserve-missing" => preserveMissing = true; i += 1
        case other                => die(s"unknown argument $other")
      }
    }
    val pipelineJson = pipeline.getOrElse(die("--pipeline or --pipeline-file required"))

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def read(path: String): DataFrame = path match {
      case "-"                        =>
        // stdin JSONL → temp file (spark.read.json needs a path/RDD)
        val tmp = java.nio.file.Files.createTempFile("graft-stdin", ".jsonl")
        java.nio.file.Files.copy(System.in, tmp, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        Aggo.fromJSONL(spark, tmp.toString, preserveMissing)
      case p if p.endsWith(".parquet") => spark.read.parquet(p)
      case p                           => Aggo.fromJSONL(spark, p, preserveMissing)
    }

    val input = read(in)
    val colls = collections.map { case (n, p) => n -> read(p) }
    val t0 = System.nanoTime()
    val result = Aggo.aggregate(input, pipelineJson, colls)

    if (explain) {
      System.err.println(Aggo.explain(input, pipelineJson, colls))
    }
    out match {
      case "-"                         => jsonLines(result, pretty).foreach(println)
      case p if p.endsWith(".parquet") => result.write.mode("overwrite").parquet(p)
      case p                           => result.write.mode("overwrite").json(p)
    }
    if (stats) {
      val secs = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[stats] ${input.count()} docs in, ${result.count()} out, $secs%.3f s")
    }
    spark.stop()
  }

  /** JSONL lines of a result, streamed partition-at-a-time: `toLocalIterator`
    * keeps driver memory bounded by one partition instead of the whole
    * result, so `--out -` on a large result cannot OOM the driver. (The
    * reference CLI materializes the full output array, cli.ts:283 — an
    * acceptable shape in-process, an unbounded allocation here.) */
  private[graft] def jsonLines(result: DataFrame, pretty: Boolean = false): Iterator[String] = {
    import scala.jdk.CollectionConverters._
    val lines = result.toJSON.toLocalIterator().asScala
    if (pretty)
      lines.map(l => org.json4s.jackson.JsonMethods.pretty(org.json4s.jackson.JsonMethods.parse(l)))
    else lines
  }

  private def die(msg: String): Nothing = { System.err.println(s"error: $msg"); sys.exit(2) }
}
