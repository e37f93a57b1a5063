package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._
import java.io.File

/** Input readers — the reference's S1/S2 (auto-format loader
  * lakehouse_op/io_loader.py:29-148; TPC-H CSV ingest with explicit
  * schema lakehouse_op/tpch_all_loader.py:77-91).
  */
object Readers {

  /** S1: sniff parquet/csv/json from file suffixes (sampling up to 8
    * files in a directory, like io_loader.py:67-92), apply per-format
    * defaults (csv: header + inferSchema), and load.
    */
  def autoRead(spark: SparkSession, path: String): DataFrame = {
    val fmt = sniffFormat(path)
    fmt match {
      case "csv" =>
        spark.read.option("header", "true").option("inferSchema", "true").csv(path)
      case "json" => spark.read.json(path)
      case _ => spark.read.parquet(path)
    }
  }

  def sniffFormat(path: String): String = {
    val f = new File(path)
    val names: Seq[String] =
      if (f.isDirectory)
        f.listFiles().toSeq.map(_.getName)
          .filterNot(n => n.startsWith("_") || n.startsWith("."))
          .take(8)
      else Seq(f.getName)
    val exts = names.flatMap { n =>
      n.split('.').lastOption.map(_.toLowerCase)
    }
    val known = Seq("parquet", "csv", "json", "jsonl")
    exts.find(known.contains) match {
      case Some("jsonl") => "json"
      case Some(e) => e
      case None => "parquet" // io_loader defaults to parquet
    }
  }

  // ---- S2: TPC-H CSV (dbgen '|'-separated, trailing separator) -------

  private def st(fields: (String, DataType)*): StructType =
    StructType(fields.map { case (n, t) => StructField(n, t) } :+
      StructField("_dummy", StringType)) // dbgen trailing '|'

  /** TPC-H schemas (reference: lakehouse_op/tpch_all_schemas.py:19-177 —
    * money columns deliberately Double, not Decimal, like the reference).
    */
  val tpchSchemas: Map[String, StructType] = Map(
    "region" -> st("r_regionkey" -> IntegerType, "r_name" -> StringType,
      "r_comment" -> StringType),
    "nation" -> st("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType, "n_comment" -> StringType),
    "customer" -> st("c_custkey" -> IntegerType, "c_name" -> StringType,
      "c_address" -> StringType, "c_nationkey" -> IntegerType,
      "c_phone" -> StringType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType, "c_comment" -> StringType),
    "supplier" -> st("s_suppkey" -> IntegerType, "s_name" -> StringType,
      "s_address" -> StringType, "s_nationkey" -> IntegerType,
      "s_phone" -> StringType, "s_acctbal" -> DoubleType,
      "s_comment" -> StringType),
    "part" -> st("p_partkey" -> IntegerType, "p_name" -> StringType,
      "p_mfgr" -> StringType, "p_brand" -> StringType,
      "p_type" -> StringType, "p_size" -> IntegerType,
      "p_container" -> StringType, "p_retailprice" -> DoubleType,
      "p_comment" -> StringType),
    "partsupp" -> st("ps_partkey" -> IntegerType, "ps_suppkey" -> IntegerType,
      "ps_availqty" -> IntegerType, "ps_supplycost" -> DoubleType,
      "ps_comment" -> StringType),
    "orders" -> st("o_orderkey" -> IntegerType, "o_custkey" -> IntegerType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> DateType, "o_orderpriority" -> StringType,
      "o_clerk" -> StringType, "o_shippriority" -> IntegerType,
      "o_comment" -> StringType),
    "lineitem" -> st("l_orderkey" -> IntegerType, "l_partkey" -> IntegerType,
      "l_suppkey" -> IntegerType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> DateType, "l_commitdate" -> DateType,
      "l_receiptdate" -> DateType, "l_shipinstruct" -> StringType,
      "l_shipmode" -> StringType, "l_comment" -> StringType))

  /** S2: read a dbgen .tbl/.csv with explicit schema, '|' separator, no
    * header, yyyy-MM-dd dates; drop the trailing dummy column.
    */
  def tpchCsv(spark: SparkSession, path: String, table: String): DataFrame = {
    val schema = tpchSchemas.getOrElse(table,
      throw new IllegalArgumentException(s"unknown TPC-H table $table"))
    spark.read
      .schema(schema)
      .option("sep", "|")
      .option("header", "false")
      .option("dateFormat", "yyyy-MM-dd")
      .csv(path)
      .drop("_dummy")
  }
}
