package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization at PRODUCTION shapes (Jégou et al. 2011) — the
  * parameterized trainer/encoder behind the oracle-pinned q172/q176/q178
  * family, which deliberately runs a tiny deterministic shape (M=4, K=4,
  * one Lloyd step) so DuckDB can replay it bit-for-bit. This operator is
  * the shape you actually deploy: any (M subspaces × subDim dims × K
  * codewords), multi-iteration Lloyd, empty-cluster preservation.
  *
  * Scale posture (the 100-TB argument, same as the query family):
  * - TRAIN touches the corpus once per iteration, each iteration one
  *   broadcast-join (codebook is K×M rows — kilobytes) + one partial agg;
  *   nothing corpus-sized ever shuffles except the (vec_id, sub, code)
  *   assignment, fixed-width rows.
  * - ENCODE is one broadcast-join + argmin per subvector; output is M
  *   SMALL ints per vector — the 4·dim/M-fold compression is what lets a
  *   billion-vector index live where the floats could not.
  * - ADC search scans CODES ONLY: the K×M lookup table for a query
  *   broadcasts, the per-vector distance is an array fold over M bytes;
  *   candidate floats are touched only by the exact top-R rerank.
  *
  * Input contract: `(vec_id BIGINT, v ARRAY<DOUBLE>)` with |v| = m·subDim.
  */
object ProductQuantizer {
  import graft.functions.VectorFunctions.vecDot

  /** PQ geometry: m subspaces of subDim dims, k codewords each, `iters`
    * Lloyd iterations over deterministic first-k seeds. */
  final case class Shape(m: Int, subDim: Int, k: Int, iters: Int) {
    require(m > 0 && subDim > 0 && k > 0 && iters > 0, s"bad PQ shape: $this")
    /** bytes per encoded vector (codes only) vs float32 storage */
    def compression(dim: Int): Double = (4.0 * dim) / (m * math.ceil(log2(k) / 8).max(1))
    private def log2(x: Int): Double = math.log(x) / math.log(2)
  }

  /** (vec_id, sub, sv): the m subvectors of every vector. */
  def subvectors(e: DataFrame, shape: Shape): DataFrame = {
    val s = e.sparkSession; import s.implicits._
    e.select($"vec_id", posexplode(expr(
        s"transform(sequence(0, ${shape.m - 1}), mm -> slice(v, mm * ${shape.subDim} + 1, ${shape.subDim}))")))
      .select($"vec_id", $"pos".as("sub"), $"col".as("sv"))
  }

  private def d2(sv: Column, cw: Column, cc: Column): Column =
    vecDot(sv, sv) - lit(2.0) * vecDot(sv, cw) + cc

  /** Train the codebook: (sub, code, cw, cc). Seeds are the subvectors of
    * the k smallest vec_ids (deterministic — no RNG, resumable); each
    * iteration assigns every subvector to its nearest codeword (broadcast
    * K×M) and recomputes means; a codeword that captured nothing keeps its
    * previous position (the standard empty-cluster guard). */
  def train(e: DataFrame, shape: Shape): DataFrame = {
    val s = e.sparkSession; import s.implicits._
    val sub = subvectors(e, shape).persist()
    val seedIds = e.select($"vec_id").orderBy($"vec_id").limit(shape.k)
      .collect().map(_.getLong(0))
    require(seedIds.length == shape.k,
      s"PQ training needs at least k=${shape.k} vectors, got ${seedIds.length}")
    var codebook = sub.filter($"vec_id".isin(seedIds: _*))
      .withColumn("code",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy($"sub").orderBy($"vec_id")) - 1)
      .select($"sub", $"code", $"sv".as("cw"))
      .withColumn("cc", vecDot($"cw", $"cw"))
    (1 to shape.iters).foreach { _ =>
      val prev = codebook.collect() // K×M rows — driver-held like a broadcast
      val prevDf = s.createDataFrame(java.util.Arrays.asList(prev: _*), prev.head.schema)
      val assigned = sub.join(broadcast(prevDf), Seq("sub"))
        .withColumn("d2", d2($"sv", $"cw", $"cc"))
        .groupBy($"vec_id", $"sub")
        .agg(min(struct($"d2", $"code")).as("mn"), first($"sv").as("sv"))
        .select($"sub", $"mn.code".as("code"), $"sv")
      val means = assigned
        .select($"sub", $"code", posexplode($"sv"))
        .groupBy($"sub", $"code", $"pos")
        .agg(avg($"col").as("mval"))
        .groupBy($"sub", $"code")
        .agg(array_sort(collect_list(struct($"pos", $"mval"))).as("pm"))
        .select($"sub", $"code", expr("transform(pm, x -> x.mval)").as("cw"))
      // empty-cluster guard: codewords no subvector chose keep their place
      codebook = prevDf.select($"sub", $"code", $"cw".as("cw_prev"))
        .join(means, Seq("sub", "code"), "left")
        .select($"sub", $"code", coalesce($"cw", $"cw_prev").as("cw"))
        .withColumn("cc", vecDot($"cw", $"cw"))
    }
    val out = codebook.persist()
    out.count() // materialize before the subvector cache is released
    sub.unpersist()
    out
  }

  /** Encode the corpus: (vec_id, codes ARRAY<INT> in subspace order). */
  def encode(e: DataFrame, codebook: DataFrame, shape: Shape): DataFrame = {
    val s = e.sparkSession; import s.implicits._
    subvectors(e, shape).join(broadcast(codebook), Seq("sub"))
      .withColumn("d2", d2($"sv", $"cw", $"cc"))
      .groupBy($"vec_id", $"sub")
      .agg(min(struct($"d2", $"code")).as("mn"))
      .groupBy($"vec_id")
      .agg(array_sort(collect_list(struct($"sub", col("mn.code").as("code"))))
        .as("sc"))
      .select($"vec_id", expr("transform(sc, x -> x.code)").as("codes"))
  }

  /** Asymmetric-distance top-`n` candidates for `query` over encoded
    * vectors: the K×M lookup table broadcasts, the distance is an array
    * fold over the M codes — the corpus floats are never read. Callers
    * rerank the survivors exactly (see the spec / q172's shape). */
  def adcTopK(query: Seq[Double], encoded: DataFrame, codebook: DataFrame,
      shape: Shape, n: Int): DataFrame = {
    val s = encoded.sparkSession; import s.implicits._
    val q = query.toArray
    val lut = codebook.withColumn("qsv", expr(
        s"slice(array(${q.mkString("D,")}D), sub * ${shape.subDim} + 1, ${shape.subDim})"))
      .select($"sub", $"code", d2($"qsv", $"cw", $"cc").as("pd"))
      .groupBy($"sub")
      .agg(array_sort(collect_list(struct($"code", $"pd"))).as("cp"))
      .select($"sub", expr("transform(cp, x -> x.pd)").as("pds"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
    // the flat LUT is indexed with stride k — a codebook that does not
    // carry exactly k codewords per subspace would silently read the wrong
    // subspace's distances, so refuse instead
    (0 until shape.m).foreach(m0 => require(
      lut.get(m0).exists(_.length == shape.k),
      s"codebook must carry k=${shape.k} codewords for subspace $m0"))
    val flat = (0 until shape.m).flatMap(m0 => lut(m0)) // m*k doubles
    encoded
      .withColumn("adist", expr(
        s"""aggregate(zip_with(codes, sequence(0, ${shape.m - 1}),
           |  (c, mm) -> element_at(array(${flat.mkString("D,")}D), mm * ${shape.k} + c + 1)),
           |0d, (acc, x) -> acc + x)""".stripMargin))
      .orderBy($"adist".asc, $"vec_id".asc)
      .limit(n)
      .select($"vec_id", $"adist")
  }
}
