package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic-testdata generator mirroring the driver's
  * sf0.1 tables (TESTDATA.md — same schemas, same value families,
  * planted duplicate/near-duplicate structure) at an arbitrary scale
  * factor. Everything derives from `xxhash64` of the row id — no RNG
  * stream, no driver-side loops — so generation is distributed,
  * repeatable, and scales to any SF a cluster can hold.
  *
  * Usage: `runMain graft.tools.GenTestData <outDir> <sf>` (sf=1 → ~6M
  * lineitem rows, the TPC-H sf1 ballpark). The correctness gate compares
  * Spark against DuckDB over the SAME files, so the value of this data
  * is scale, not bit-compatibility with the driver generator. */
object GenTestData {

  private def h(cols: org.apache.spark.sql.Column*): org.apache.spark.sql.Column =
    abs(xxhash64(cols: _*))

  private def money(c: org.apache.spark.sql.Column, lo: Double, hi: Double,
      salt: String): org.apache.spark.sql.Column =
    round(lit(lo) + (h(c, lit(salt)) % lit(((hi - lo) * 100).toLong))
      .cast("double") / 100.0, 2)

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: GenTestData <outDir> <sf>")
    val out = args(0)
    val sf = args(1).toDouble
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional 3rd arg: comma-separated table subset (resume a partial run)
    generate(spark, out, sf,
      args.lift(2).map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty))
    spark.stop()
  }

  def generate(spark: SparkSession, out: String, sf: Double,
      only: Set[String] = Set.empty): Unit = {
    val nCust = (150000 * sf).toInt.max(100)
    val nOrders = (1500000 * sf).toInt.max(1000)
    val nPart = (200000 * sf).toInt.max(200)
    val nSupp = (10000 * sf).toInt.max(50)
    val nEvents = (1000000 * sf).toInt.max(1000)
    val nDocs = (50000 * sf).toInt.max(200)
    // embeddings follow the driver's 4x-per-decade curve (500 @ sf0.01,
    // 2000 @ sf0.1): all-pairs consumers (l10) stay tractable
    val nEmb = (2000 * math.pow(4, math.log10(sf * 10))).toInt.max(200)

    // ONE file per table (the TESTDATA.md layout; the DuckDB oracle
    // reads <dir>/<name>.parquet as a single file): compute stays
    // parallel, the final shuffle funnels into a single writer.
    // Past sf~50 the single-writer funnel becomes the wall-clock
    // bottleneck (lineitem at sf100 is ~600M rows), so big tables write
    // `<name>.parquet/` as a DIRECTORY of parts — Spark reads either
    // layout transparently; check_oracle.py globs when it sees a dir.
    val multiFile = sf >= 50
    def write(name: String, df: DataFrame, parts: Int = 8): Unit = {
      if (only.nonEmpty && !only.contains(name)) return
      println(s"[gen] writing $name")
      if (multiFile && parts > 1) {
        df.repartition(parts * 8).write.mode("overwrite")
          .parquet(java.nio.file.Paths.get(out, s"$name.parquet").toString)
        return
      }
      val tmp = java.nio.file.Paths.get(out, s"_tmp_$name")
      df.repartition(1).write.mode("overwrite").parquet(tmp.toString)
      val part = graft.catalog.PathIO.list(tmp)
        .find(_.getFileName.toString.endsWith(".parquet"))
        .getOrElse(throw new IllegalStateException(s"no parquet for $name"))
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
      val dest = java.nio.file.Paths.get(out, s"$name.parquet")
      // REPLACE_EXISTING only replaces an EMPTY directory: if a prior
      // sf>=50 run left a directory-of-parts here, clear it first or the
      // move throws DirectoryNotEmptyException
      if (java.nio.file.Files.isDirectory(dest))
        graft.catalog.PathIO.walk(dest).sortBy(_.toString).reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      java.nio.file.Files.move(part, dest,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      graft.catalog.PathIO.walk(tmp).sortBy(_.toString).reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }

    val regions = Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")
    write("region", spark.range(5).select(
      col("id").cast("int").as("r_regionkey"),
      element_at(array(regions.map(lit): _*),
        col("id").cast("int") + 1).as("r_name")), 1)

    write("nation", spark.range(25).select(
      col("id").cast("int").as("n_nationkey"),
      concat(lit("NATION_"), col("id")).as("n_name"),
      (col("id") % 5).cast("int").as("n_regionkey")), 1)

    val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
    write("customer", spark.range(nCust).select(
      col("id").as("c_custkey"),
      format_string("Customer#%09d", col("id")).as("c_name"),
      (h(col("id"), lit("cn")) % 25).cast("int").as("c_nationkey"),
      money(col("id"), -1000, 10000, "cb").as("c_acctbal"),
      element_at(array(segs.map(lit): _*),
        (h(col("id"), lit("cs")) % 5).cast("int") + 1).as("c_mktsegment")))

    write("supplier", spark.range(nSupp).select(
      col("id").as("s_suppkey"),
      format_string("Supplier#%09d", col("id")).as("s_name"),
      (h(col("id"), lit("sn")) % 25).cast("int").as("s_nationkey"),
      money(col("id"), -1000, 10000, "sb").as("s_acctbal")), 2)

    val adjs = Seq("large", "hot", "blue", "old", "dark", "light", "new", "small")
    val nouns = Seq("ring", "bolt", "plate", "tube", "disk", "cap", "rod", "gear")
    val types = Seq("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD")
    write("part", spark.range(nPart).select(
      col("id").as("p_partkey"),
      concat(
        element_at(array(adjs.map(lit): _*), (h(col("id"), lit("pa")) % 8).cast("int") + 1),
        lit(" "),
        element_at(array(nouns.map(lit): _*), (h(col("id"), lit("pn")) % 8).cast("int") + 1))
        .as("p_name"),
      concat(lit("Brand#"), (h(col("id"), lit("pb")) % 25) + 1).as("p_brand"),
      element_at(array(types.map(lit): _*),
        (h(col("id"), lit("pt")) % 6).cast("int") + 1).as("p_type"),
      ((h(col("id"), lit("ps")) % 50).cast("int") + 1).as("p_size"),
      round(lit(900.0) + (col("id") % 1000).cast("double") / 10.0, 2)
        .as("p_retailprice")))

    // orders + lineitem share the o_orderdate derivation (no join needed)
    def orderDate(k: org.apache.spark.sql.Column) =
      date_add(to_date(lit("1995-01-01")),
        (h(k, lit("od")) % 2400).cast("int"))
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    write("orders", spark.range(nOrders).select(
      col("id").as("o_orderkey"),
      (h(col("id"), lit("oc")) % nCust).as("o_custkey"),
      element_at(array(lit("O"), lit("P"), lit("F")),
        (h(col("id"), lit("os")) % 3).cast("int") + 1).as("o_orderstatus"),
      money(col("id"), 1000, 500000, "op").as("o_totalprice"),
      orderDate(col("id")).cast("timestamp").as("o_orderdate"),
      element_at(array(prios.map(lit): _*),
        (h(col("id"), lit("opr")) % 5).cast("int") + 1).as("o_orderpriority")), 16)

    // 1..7 lines per order (avg ~4), exploded distributively
    write("lineitem", spark.range(nOrders).select(
      col("id").as("l_orderkey"),
      explode(sequence(lit(1),
        (h(col("id"), lit("ln")) % 7).cast("int") + 1)).as("l_linenumber"))
      .select(
        col("l_orderkey"),
        (h(col("l_orderkey"), col("l_linenumber"), lit("lp")) % nPart).as("l_partkey"),
        (h(col("l_orderkey"), col("l_linenumber"), lit("ls")) % nSupp).as("l_suppkey"),
        col("l_linenumber").cast("int"),
        ((h(col("l_orderkey"), col("l_linenumber"), lit("lq")) % 50)
          .cast("double") + 1.0).as("l_quantity"),
        money(col("l_orderkey") * 10 + col("l_linenumber"), 900, 105000, "le")
          .as("l_extendedprice"),
        ((h(col("l_orderkey"), col("l_linenumber"), lit("ld")) % 11)
          .cast("double") / 100.0).as("l_discount"),
        ((h(col("l_orderkey"), col("l_linenumber"), lit("lt")) % 9)
          .cast("double") / 100.0).as("l_tax"),
        element_at(array(lit("A"), lit("N"), lit("R")),
          (h(col("l_orderkey"), col("l_linenumber"), lit("lr")) % 3).cast("int") + 1)
          .as("l_returnflag"),
        element_at(array(lit("F"), lit("O")),
          (h(col("l_orderkey"), col("l_linenumber"), lit("ll")) % 2).cast("int") + 1)
          .as("l_linestatus"),
        date_add(orderDate(col("l_orderkey")),
          (h(col("l_orderkey"), col("l_linenumber"), lit("lsd")) % 95).cast("int") + 1)
          .cast("timestamp").as("l_shipdate")), 24)

    val evTypes = Seq("click", "error", "purchase", "signup", "view")
    write("events", spark.range(nEvents).select(
      col("id").as("event_id"),
      timestamp_micros(
        to_timestamp(lit("2024-01-01 00:00:00")).cast("long") * 1000000L +
          h(col("id"), lit("et")) % (30L * 86400 * 1000000)).as("ts"),
      (h(col("id"), lit("eu")) % (nEvents / 67).max(10)).as("user_id"),
      element_at(array(evTypes.map(lit): _*),
        (h(col("id"), lit("ety")) % 5).cast("int") + 1).as("event_type"),
      ((h(col("id"), lit("ev")) % 56022).cast("double") / 100.0).as("value"),
      format_string("{\"k\": %d}", h(col("id"), lit("ek")) % 100).as("props")), 8)

    // documents: 40-90 words from a fixed vocab, en-heavy languages, 20
    // sources, planted EXACT duplicates (id % 60 == 59 copies id-1) and
    // NEAR duplicates (id % 97 == 96 copies id-1 with a changed tail) —
    // the structure the dedup operator family needs to find
    val vocab = Seq("spark", "table", "query", "scan", "filter", "join",
      "agg", "sort", "shuffle", "column", "row", "batch", "stream", "hash",
      "merge", "order", "line", "part", "value", "fast", "slow", "small",
      "large", "vector", "index", "cache", "disk", "memory", "plan",
      "codegen", "customer", "data", "file", "page", "stat", "bloom")
    val vlen = vocab.size
    val wordAt = (docId: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) =>
      element_at(array(vocab.map(lit): _*),
        (h(docId, i, lit("w")) % vlen).cast("int") + 1)
    val langs = Seq("en", "en", "en", "en", "zh", "de", "es", "fr")
    val baseDocs = spark.range(nDocs).select(
      col("id").as("doc_id"),
      // the text SOURCE id: exact dups copy the previous doc verbatim,
      // near dups copy it then perturb the tail
      when(col("id") % 60 === 59 || col("id") % 97 === 96, col("id") - 1)
        .otherwise(col("id")).as("tid"),
      (col("id") % 97 === 96).as("perturb"))
    val withText = baseDocs.select(
      col("doc_id"),
      concat_ws(" ",
        transform(
          sequence(lit(0), (h(col("tid"), lit("dl")) % 51).cast("int") + 39),
          i => when(col("perturb") && i >= 2 && i <= 4,
            concat(lit("edited"), i)).otherwise(wordAt(col("tid"), i))))
        .as("text"))
    write("documents", withText.select(
      col("doc_id"),
      col("text"),
      element_at(array(langs.map(lit): _*),
        (h(col("doc_id"), lit("dla")) % 8).cast("int") + 1).as("lang"),
      concat(lit("src"), h(col("doc_id"), lit("dsrc")) % 20).as("source"),
      length(col("text")).as("n_chars")), 4)

    // embeddings: 64-dim unit vectors around 10 label centroids, planted
    // near-duplicate pairs (id % 40 == 39 perturbs id-1 slightly)
    val dim = 64
    val rawDims = (0 until dim).map { d =>
      // centroid component (by label) + per-vector noise, both hash-derived
      val lbl = col("lid") % 10
      val cent = (xxhash64(lbl, lit(s"c$d")) % 2001).cast("double") / 1000.0
      val noise = (xxhash64(col("nid"), lit(s"n$d")) % 2001).cast("double") / 1000.0
      (cent * 0.8 + noise * 0.7).as(s"d$d")
    }
    val base = spark.range(nEmb).select(
      col("id").as("vec_id"),
      when(col("id") % 40 === 39, col("id") - 1).otherwise(col("id")).as("cid"),
      (col("id") % 40 === 39).as("perturbv"))
      .select(col("vec_id"),
        col("cid").as("lid"),
        // near-dups share the source vector but add a tiny extra noise id
        when(col("perturbv"), col("cid") + 1000000).otherwise(col("cid")).as("nid0"),
        col("cid").as("nid"), col("perturbv"))
    val withDims = base.select((col("vec_id") +: col("perturbv") +: col("nid0") +:
      rawDims): _*)
    val arr = withDims.select(col("vec_id"), col("perturbv"), col("nid0"),
      array((0 until dim).map(d => col(s"d$d")): _*).as("raw"))
    val jitter = transform(col("raw"), (x, i) =>
      when(col("perturbv"),
        x + (xxhash64(col("nid0"), i, lit("j")) % 41).cast("double") / 1000.0)
        .otherwise(x))
    val normed = arr.select(col("vec_id"), jitter.as("raw"))
      .withColumn("nrm", sqrt(aggregate(col("raw"), lit(0.0), (a, x) => a + x * x)))
      .select(col("vec_id"),
        transform(col("raw"), x => (x / col("nrm")).cast("float")).as("embedding"),
        (col("vec_id") % 10).cast("int").as("label"))
    write("embeddings", normed, 2)
  }
}
