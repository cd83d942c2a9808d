package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import TestSpark._

/** Pins the parquet footer encodings produced by
  * [[graft.ext.Dedup.noDictOptionsExcept]]: the blanket dictionary-off
  * write option (the float-array pathology fix) must NOT disable the
  * dictionary for the re-enabled low-cardinality columns — PQ `codes`
  * (ksub distinct values per position) and `cluster` (≤nlist distinct) are
  * exactly the page shapes dictionary+RLE compresses best, and r10's
  * blanket noDict on the IVF-PQ index spill was the prime suspect for the
  * sf1IvfPqBuild 11.1→15.4 s regression. This spec is the ground truth
  * that parquet 1.16 honors the `parquet.enable.dictionary#<leaf-path>`
  * per-column override through Spark's write options. */
class PerColumnDictSpec extends AnyFunSuite {

  private def leafEncodings(dir: String): Map[String, Set[String]] = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(hconf)
    val part = fs.listStatus(p).map(_.getPath)
      .find(_.getName.endsWith(".parquet"))
      .getOrElse(fail(s"no parquet part under $dir"))
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(part, hconf))
    try {
      import scala.jdk.CollectionConverters._
      reader.getFooter.getBlocks.asScala.flatMap(_.getColumns.asScala)
        .groupBy(_.getPath.toDotString)
        .map { case (path, chunks) =>
          path -> chunks.flatMap(_.getEncodings.asScala.map(_.name())).toSet }
    } finally reader.close()
  }

  private def hasDict(encs: Set[String]): Boolean =
    encs.contains("PLAIN_DICTIONARY") || encs.contains("RLE_DICTIONARY")

  test("noDictOptionsExcept re-enables the dictionary only for the named columns") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // hash-valued floats never repeat; codes/cluster are low-cardinality
    val df = (1 to 4000).map { i =>
      (i.toLong,
       Array.fill(64)(rnd.nextFloat()),
       Array.fill(8)(rnd.nextInt(16)),
       rnd.nextInt(32))
    }.toDF("neighbor_id", "c_vec", "codes", "cluster")
    val dir = java.nio.file.Files.createTempDirectory("graft-dict-ab").toString

    df.coalesce(1).write.mode("overwrite")
      .options(graft.ext.Dedup.noDictOptionsExcept("codes", "cluster"))
      .parquet(s"$dir/percol")
    val encs = leafEncodings(s"$dir/percol")
    assert(hasDict(encs("codes.list.element")),
      s"codes page lost its dictionary: ${encs("codes.list.element")}")
    assert(hasDict(encs("cluster")),
      s"cluster page lost its dictionary: ${encs("cluster")}")
    assert(!hasDict(encs("c_vec.list.element")),
      s"float vectors must stay dictionary-off: ${encs("c_vec.list.element")}")

    // control: the blanket option kills all three (proves the per-column
    // key, not parquet's own heuristic fallback, is what flipped codes on)
    df.coalesce(1).write.mode("overwrite")
      .options(graft.ext.Dedup.noDictOptions).parquet(s"$dir/blanket")
    val blanket = leafEncodings(s"$dir/blanket")
    Seq("codes.list.element", "cluster", "c_vec.list.element").foreach { c =>
      assert(!hasDict(blanket(c)), s"blanket noDict left a dictionary on $c")
    }

    // the size datapoint the r10 verdict asked for: dictionary ON for the
    // codes page must not be LARGER than plain (it should be much smaller)
    def bytesOf(sub: String): Long = {
      val hconf = spark.sparkContext.hadoopConfiguration
      val p = new org.apache.hadoop.fs.Path(s"$dir/$sub")
      val fs = p.getFileSystem(hconf)
      fs.listStatus(p).filter(_.getPath.getName.endsWith(".parquet")).map(_.getLen).sum
    }
    assert(bytesOf("percol") <= bytesOf("blanket"),
      s"per-column dict write larger than blanket: ${bytesOf("percol")} vs ${bytesOf("blanket")}")
  }
}
