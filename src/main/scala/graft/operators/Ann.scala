package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over the embedding column (SURVEY §2 #30-32):
  * brute-force cosine top-k as the exactness baseline, sign-random-
  * projection LSH as the scale path, and embedding-cosine near-dup
  * pairs with a blocking key.
  *
  * Vector math on the hot path uses graft's native codegen'd Catalyst
  * expressions ([[graft.functions.DotProduct]]/[[graft.functions.L2Norm]]
  * — tight primitive loops under whole-stage codegen). They fold
  * left-to-right exactly like the portable HOF formulation
  * (`aggregate(zip_with(a, b, _*_), 0d, _+_)`, kept here as
  * [[Ann.dotHof]] for engines without the extension), so results are
  * bit-identical on any partitioning and to the DuckDB oracles. No
  * UDF, no collect.
  */
object Ann {

  /** Cast a float embedding to double per element. The native
    * expressions accept array<float> directly (exact widening), so the
    * hot paths pass raw embeddings; this remains for the portable HOF
    * twins, which need array<double>. */
  def asDouble(emb: Column): Column = transform(emb, x => x.cast("double"))

  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  def norm(a: Column): Column = call_function("graft_norm", a)

  /** Portable higher-order-function twin of [[dot]] — same sequential
    * fold, interpreted; used by the spec to pin bit-equality. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact cosine top-k: broadcast the (small) query set against the
    * corpus scan — the corpus is touched once, never shuffled; the
    * only shuffle is the per-query top-k window over scored rows,
    * bounded by |queries| × |corpus| rows of (id, id, double). Norms
    * are computed ONCE per vector in the pre-join projections (the
    * higher-order folds are interpreted, not codegen'd — recomputing a
    * norm per PAIR would triple the fold work for identical results:
    * sqrt(Σx²)·sqrt(Σy²) is the same double either way). */
  def bruteForceTopK(embeddings: DataFrame, numQueries: Int = 5, k: Int = 3): DataFrame = {
    graft.GraftExtensions.register(embeddings.sparkSession)
    import org.apache.spark.sql.expressions.Window
    val e = embeddings.select(col("vec_id"), col("embedding").as("emb"))
      .withColumn("nrm", norm(col("emb")))
    val q = e.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("emb").as("qemb"), col("nrm").as("qnrm"))
    e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cos", dot(col("qemb"), col("emb")) / (col("qnrm") * col("nrm")))
      .withColumn("rank",
        row_number().over(Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("vec_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), col("cos").as("cosine"), col("rank"))
  }

  /** Sign-random-projection buckets for ALL hash tables in one native
    * pass ([[graft.functions.SrpBuckets]]): deterministic ±1
    * hyperplanes, one packed sign-pattern long per table — the per-row
    * LSH indexing cost, computed inside the scan projection. */
  def srpBuckets(emb: Column, tables: Int, numBits: Int): Column =
    call_function("graft_srp_buckets", emb, lit(tables), lit(numBits))

  /** Portable twin ([[graft.functions.SrpBucketsMd5]]): md5-derived
    * ±1 hyperplanes a SQL engine replays verbatim — the family the
    * registered `ann_lsh` rows ride so bucket membership itself is
    * oracle-checkable; same per-row cost (the constant weight matrix
    * is cached per executor). */
  def srpBucketsMd5(emb: Column, tables: Int, numBits: Int): Column =
    call_function("graft_srp_buckets_md5", emb, lit(tables), lit(numBits))

  /** LSH-bucketed ANN: L hash tables of `numBits` sign bits; queries
    * meet only same-bucket candidates (the join key is (table,
    * bucket)), then exact cosine re-ranks the candidate set. Recall
    * grows with L at constant per-table cost — the knob a 100 TB
    * deployment tunes instead of ever falling back to brute force. */
  def lshTopK(embeddings: DataFrame, numQueries: Int = 5, k: Int = 3,
              tables: Int = 4, numBits: Int = 8): DataFrame = {
    graft.GraftExtensions.register(embeddings.sparkSession)
    import org.apache.spark.sql.expressions.Window
    val e = embeddings.select(col("vec_id"), col("embedding").as("emb"))
      .withColumn("nrm", norm(col("emb")))
    val banded = e.select(col("vec_id"), col("emb"), col("nrm"),
      posexplode(srpBucketsMd5(col("emb"), tables, numBits)).as(Seq("table", "bucket")))
    val q = banded.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("emb").as("qemb"), col("nrm").as("qnrm"),
        col("table"), col("bucket"))
    banded.join(q, Seq("table", "bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("qemb"), col("emb"), col("qnrm"), col("nrm"))
      .dropDuplicates("query_id", "vec_id")
      .withColumn("cos", dot(col("qemb"), col("emb")) / (col("qnrm") * col("nrm")))
      .withColumn("rank",
        row_number().over(Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("vec_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), col("cos").as("cosine"), col("rank"))
  }

  /** Fixed-size IVF coarse-centroid set, aggregated to ONE row: the
    * `numCentroids` lowest vec_ids stand in for trained k-means
    * centroids (deterministic; a trained set slots in unchanged).
    * |centroids| is a constant independent of corpus size — the
    * broadcast stays k vectors at 100 TB, unlike an every-Nth-vector
    * sample whose broadcast (and pair expansion) grows with N. */
  private[graft] def ivfCentroids(e: DataFrame, numCentroids: Int): DataFrame =
    e.filter(col("vec_id") < numCentroids)
      .agg(collect_list(struct(col("vec_id").as("cell"), col("emb").as("cemb"),
        col("nrm").as("cnrm"))).as("cents"))

  /** Lloyd's k-means refinement of the IVF coarse quantizer: start
    * from the deterministic [[ivfCentroids]] seed and run `iters`
    * assign/re-center rounds. Better-centered cells mean fewer
    * same-cell misses at a fixed nprobe — the recall knob that costs
    * training time instead of query time.
    *
    * Scale shape per round (r20): assignment is the same map-side
    * broadcast argmin the query path uses (no shuffle); re-centering
    * folds WHOLE vectors elementwise per cell through ONE exchange —
    * no posexplode, no per-(cell, dim) level. Cells that attract no
    * vectors keep their previous centroid (the standard empty-cell
    * rule). The fixpoint is driver-coordinated with `localCheckpoint`
    * cutting per-round lineage, exactly like [[Dedup.clusterPairs]];
    * a FIXED iteration count keeps runs reproducible (vs
    * convergence-epsilon on floats).
    *
    * `deterministic = false` (production): the running-array partials
    * ([[graft.functions.FoldSumArr]]) are map-side combinable — the
    * shuffle carries k dims-length partials per map task, but double
    * addition is partition-order-dependent, so means are not
    * bit-stable across layouts. `deterministic = true` (the
    * oracle-checked registry path): each cell folds its member
    * vectors elementwise in ascending `vec_id` order
    * ([[graft.functions.SortedFoldSumArr]]), which any engine can
    * replay bit-for-bit — the shuffle carries the member vectors
    * instead of partials, the price of byte-level reproducibility.
    * A spec pins both modes to the same top-k at gate SF. */
  private[graft] def kmeansCentroids(e: DataFrame, k: Int, iters: Int,
                                     deterministic: Boolean = false,
                                     seed: Option[DataFrame] = None): DataFrame = {
    require(iters >= 0)
    graft.GraftExtensions.register(e.sparkSession) // graft_sorted_fold_sum
    // Pin the training frame for the fixed round count (guide §5:
    // reuse beats recompute — every Lloyd round's assignment pass
    // re-scanned the corpus projection from parquet). A LAZY
    // localCheckpoint, not persist(): raw row blocks materialized
    // once inside the first consuming job, read by every later
    // round; persist()'s columnar re-encode of the embedding arrays
    // was measured costing more than the scans it saves. IN-PLAN and
    // per-call: the pin is a fresh frame per invocation, its blocks
    // die with the RDD — nothing survives the call, every invocation
    // still computes from the parquet inputs.
    val train = if (iters >= 1) e.localCheckpoint(false) else e
    // LAZY checkpoints throughout the fixpoint (r20): lineage is cut
    // identically, but each round's k-row centroid frame materializes
    // inside the NEXT job that reads it (the assign broadcast build)
    // instead of paying its own eager driver round-trip — one job per
    // round saved, values untouched.
    var cents = seed.getOrElse(ivfCentroids(train, k)).localCheckpoint(false)
    var it = 0
    while (it < iters) {
      val assigned = nearestCells(train, cents, "emb", "nrm", keep = 1)
      // Re-centering through ONE cell-keyed exchange (r20): whole
      // vectors fold elementwise per cell — the (cell, pos) partial
      // level, its posexplode (dims× the rows) and the collect_list/
      // array_sort reassembly are gone. The array fold performs the
      // identical per-dimension IEEE additions in the identical
      // vec_id order, so means are bit-identical (guide §2.3/§2.4).
      val sums = assigned.groupBy(col("cell"))
      val means = (if (deterministic)
        sums.agg(call_function("graft_sorted_fold_sum_arr",
          col("vec_id"), asDouble(col("emb"))).as("sx"), count(lit(1)).as("c"))
      else
        sums.agg(call_function("graft_fold_sum_arr", asDouble(col("emb"))).as("sx"),
          count(lit(1)).as("c")))
        .select(col("cell"),
          transform(col("sx"), x => x / col("c")).as("cemb"))
        .withColumn("cnrm", norm(col("cemb")))
      val prev = cents.select(explode(col("cents")).as("p"))
        .select(col("p.cell").as("cell"), col("p.cemb").as("pemb"),
          col("p.cnrm").as("pnrm"))
      cents = prev.join(means, Seq("cell"), "left")
        .select(col("cell"),
          coalesce(col("cemb"), asDouble(col("pemb"))).as("cemb"),
          coalesce(col("cnrm"), col("pnrm")).as("cnrm"))
        .agg(collect_list(struct(col("cell"), col("cemb"), col("cnrm"))).as("cents"))
        .localCheckpoint(false)
      it += 1
    }
    cents
  }

  /** [[ivfTopK]] with a TRAINED coarse quantizer: same query path,
    * centroids refined by [[kmeansCentroids]] first. The registry
    * runs `deterministic = true` so the DuckDB oracle can replay the
    * whole training loop bit-for-bit
    * ([[graft.OracleSql.kmeansQuerySql]]). */
  def ivfTopKTrained(embeddings: DataFrame, numQueries: Int = 5, k: Int = 3,
                     numCentroids: Int = 64, nprobe: Int = 4,
                     trainIters: Int = 3, deterministic: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.GraftExtensions.register(embeddings.sparkSession)
    val e = embeddings.select(col("vec_id"), col("embedding").as("emb"))
      .withColumn("nrm", norm(col("emb")))
    val centroids = kmeansCentroids(e, numCentroids, trainIters, deterministic)
    val cells = nearestCells(e, centroids, "emb", "nrm", keep = 1)
    val q = nearestCells(
      e.filter(col("vec_id") < numQueries)
        .select(col("vec_id").as("query_id"), col("emb").as("qemb"), col("nrm").as("qnrm")),
      centroids, "qemb", "qnrm", keep = nprobe)
    cells.join(q, Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", dot(col("qemb"), col("emb")) / (col("qnrm") * col("nrm")))
      .select(col("query_id"), col("vec_id"), col("cos"))
      .dropDuplicates("query_id", "vec_id")
      .withColumn("rank",
        row_number().over(Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("vec_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), col("cos").as("cosine"), col("rank"))
  }

  /** Map-side nearest-cell assignment: each row scores the broadcast
    * one-row centroid array with array HOFs and explodes its `keep`
    * best cells — no per-pair row expansion, no window, no shuffle on
    * the corpus side (plan-spec-pinned). The (-sim, cell) sort key
    * ranks by similarity descending with ties to the lower cell id. */
  private[graft] def nearestCells(df: DataFrame, centroids: DataFrame,
                                  embCol: String, nrmCol: String, keep: Int): DataFrame = {
    val scored = transform(col("cents"), c =>
      struct((-(dot(col(embCol), c.getField("cemb")) / (col(nrmCol) * c.getField("cnrm"))))
        .as("negsim"), c.getField("cell").as("cell")))
    val joined = df.crossJoin(broadcast(centroids))
    // keep=1 (the whole corpus) is an O(k) argmin fused into ONE
    // native pass ([[graft.functions.IvfArgmin]] — no per-centroid
    // lambda binds or struct allocations, same ordering as the
    // declarative struct-min, spec-pinned equal); keep>1 (the handful
    // of query rows) pays the interpreted sort.
    //
    // coalesce(argmin, -1) rather than the bare argmin (r21): `cell`
    // feeds inner equi-joins, so constraint inference adds an
    // isnotnull(cell) filter that predicate pushdown substitutes back
    // through this projection — the plan dumps showed
    // `isnotnull(graft_ivf_argmin(emb, cents))` in the broadcast-join
    // condition, i.e. the full k×dims argmin evaluated TWICE per
    // corpus row. The coalesce makes the column non-nullable, so the
    // inferred null-check folds away and the argmin runs once. Values
    // are identical in every consumer: argmin is null only for
    // malformed inputs (impossible by construction, spec-pinned), and
    // if one ever occurred, cell −1 — an id no codebook contains —
    // drops in the equi-joins and in the re-center's prev-side left
    // join exactly where the null row dropped before.
    val assigned =
      if (keep == 1) joined.withColumn("cell",
        coalesce(call_function("graft_ivf_argmin", col(embCol), col("cents")),
          lit(-1L)))
      else joined
        .withColumn("__cell", explode(slice(array_sort(scored), 1, keep)))
        .withColumn("cell", col("__cell.cell"))
        .drop("__cell")
    assigned.drop("cents")
  }

  /** IVF (inverted-file) ANN: a fixed-size deterministic subset of the
    * corpus serves as coarse centroids; every vector is assigned to
    * its nearest centroid cell map-side ([[nearestCells]]), queries
    * probe their `nprobe` nearest cells and rank exact cosine only
    * inside them. At 100 TB the cell assignment is a scan-side
    * projection against a constant-size broadcast, the probe join
    * shuffles on cell id, and recall/cost is tuned with `nprobe` —
    * the classic IVF trade, no training step (real k-means centroids
    * would slot into [[ivfCentroids]] unchanged). */
  def ivfTopK(embeddings: DataFrame, numQueries: Int = 5, k: Int = 3,
              numCentroids: Int = 64, nprobe: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.GraftExtensions.register(embeddings.sparkSession)
    val e = embeddings.select(col("vec_id"), col("embedding").as("emb"))
      .withColumn("nrm", norm(col("emb")))
    val centroids = ivfCentroids(e, numCentroids)
    val cells = nearestCells(e, centroids, "emb", "nrm", keep = 1)
    val q = nearestCells(
      e.filter(col("vec_id") < numQueries)
        .select(col("vec_id").as("query_id"), col("emb").as("qemb"), col("nrm").as("qnrm")),
      centroids, "qemb", "qnrm", keep = nprobe)
    cells.join(q, Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      // score BEFORE deduping so the dedup aggregate sees only three
      // narrow columns: with the embedding arrays still aboard,
      // dropDuplicates plans as first(array<double>) which cannot
      // hash-aggregate and falls back to Sort + SortAggregate ×2; the
      // narrow form is a plain hash aggregate (cos is deterministic
      // per pair, so deduping after scoring is value-identical)
      .withColumn("cos", dot(col("qemb"), col("emb")) / (col("qnrm") * col("nrm")))
      .select(col("query_id"), col("vec_id"), col("cos"))
      .dropDuplicates("query_id", "vec_id")
      .withColumn("rank",
        row_number().over(Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("vec_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), col("cos").as("cosine"), col("rank"))
  }

  /** Symmetric int8 quantization of an embedding: each component maps
    * to floor(x·127/max|x| + 0.5) ∈ [-127, 127]. `floor` rather than
    * `round` because floor is exactly specified on every engine while
    * round's half-way rule differs (HALF_UP vs banker's); the +0.5
    * shift makes it round-half-toward-+∞ — deterministic bit-for-bit.
    * All-zero vectors quantize to all-zero (no division). Values are
    * kept as integer-valued DOUBLES: every quantized dot product is
    * ≤ 127²·dims ≪  2^53, so the native codegen'd [[dot]] computes
    * EXACT integer arithmetic at float-pipeline speed — no separate
    * integer kernel needed. */
  def quantize(emb: Column): Column =
    call_function("graft_quantize_int8", emb)

  /** Portable declarative twin of [[quantize]] — interpreted HOF
    * passes where the native expression is one loop; kept for the
    * bit-identity spec pin and engines without the extension. The
    * explicit `exists(isnull)` guard makes the twin null-poison whole
    * vectors exactly like the native expression (bare `transform`
    * would instead keep null elements and quantize the rest, because
    * `array_max` skips nulls — a silent contract divergence). */
  private[graft] def quantizeHof(emb: Column): Column = {
    val d = transform(emb, x => x.cast("double"))
    val maxabs = array_max(transform(d, x => abs(x)))
    when(exists(d, x => x.isNull), lit(null).cast("array<double>"))
      .when(maxabs === 0.0, d)
      .otherwise(transform(d, x => floor(x * 127.0 / maxabs + 0.5)))
  }

  /** Brute-force cosine top-k over int8-QUANTIZED embeddings — the
    * memory-bandwidth path of ANN at 100 TB: int8 storage is 4× (vs
    * float32) to 8× (vs float64) smaller, which at corpus scale is the
    * difference between vectors living in page cache or on disk; real
    * deployments run the integer scan first and re-rank survivors at
    * full precision. Same broadcast-queries/no-corpus-shuffle shape as
    * [[bruteForceTopK]], and because the quantization and the dot are
    * exact arithmetic (see [[quantize]]) the whole query — unlike most
    * quantized-ANN code — verifies row-for-row against a SQL oracle.
    * Zero-norm (all-zero) quantized vectors are excluded: their cosine
    * is undefined, and rows dropped beat NaN ordering surprises. */
  def quantizedTopK(embeddings: DataFrame, numQueries: Int = 5, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.GraftExtensions.register(embeddings.sparkSession)
    val e = embeddings.select(col("vec_id"), quantize(col("embedding")).as("q"))
      .withColumn("nq", dot(col("q"), col("q")))
      .filter(col("nq") > 0.0)
    val queries = e.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("q").as("qq"), col("nq").as("qnq"))
    e.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos_q", dot(col("qq"), col("q")) / (sqrt(col("qnq")) * sqrt(col("nq"))))
      .withColumn("rank",
        row_number().over(Window.partitionBy(col("query_id"))
          .orderBy(col("cos_q").desc, col("vec_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), col("cos_q").as("cosine_q"), col("rank"))
  }

  /** Second-moment table of the int8-quantized embeddings — the
    * statistics that TUNE a quantized index: per dimension pair
    * (i ≤ j), the exact product sum and the covariance. Off-diagonal
    * covariance structure tells you whether scalar (per-dimension)
    * quantization is leaving accuracy on the table (correlated dims
    * → a rotation/PCA before SQ would decorrelate); the diagonal is
    * the per-dimension energy a re-scaling would equalize. Runs on
    * the QUANTIZED values deliberately: these are the integers the
    * index actually stores, and integer arithmetic makes every
    * moment exact — products ≤ 127² sum in decimal(30,0), so the
    * whole table (and the covariance derived from it with one
    * mirrored double expression) replays bit-for-bit in SQL.
    *
    * Scale shape: the dims² explode inflates rows 4096× BUT the
    * aggregate is map-side combinable into a constant dims²/2 = 2080
    * groups — the shuffle carries 2080 rows per map partition no
    * matter the corpus, and the result always fits the driver. The
    * explode never leaves the partial-aggregation pipeline, which is
    * the same bound the bigram/BPE statistics ride. */
  def quantizedMoments(embeddings: DataFrame): DataFrame = {
    graft.GraftExtensions.register(embeddings.sparkSession)
    embeddings
      .select(quantize(col("embedding")).as("q"))
      .select(posexplode(col("q")).as(Seq("i0", "x")), col("q"))
      // generate ONLY the upper triangle: the inner explode walks the
      // tail slice q[i..], never the full array — half the generated
      // rows of an explode-then-filter (measured 6.8 s → the explode
      // dominated this query's cost at sf0.1)
      .select(col("i0"), col("x"),
        posexplode(slice(col("q"), col("i0") + 1, size(col("q")) - col("i0")))
          .as(Seq("j1", "y")))
      // 1-based dims: matches SQL list indexing, so the oracle needs
      // no off-by-one shim; j = i + slice offset
      .groupBy((col("i0") + 1).as("dim_i"), (col("i0") + col("j1") + 1).as("dim_j"))
      // LONG sums, not decimal: products are bounded by 127² = 16129,
      // so a 64-bit sum is exact until ~5.7e14 vectors (≈ 570 PB of
      // 64-dim float32) — three orders of magnitude past the design
      // point, where decimal aggregation costs ~3× on the hot path
      // (measured: the decimal form made this the suite's slowest
      // query). The bound is documented, not silent: it dwarfs any
      // corpus this engine targets.
      .agg(
        count(lit(1)).as("n"),
        sum((col("x") * col("y")).cast("long")).as("sxy"),
        sum(col("x").cast("long")).as("sx"),
        sum(col("y").cast("long")).as("sy"))
      .select(col("dim_i"), col("dim_j"), col("n"),
        col("sxy").cast("double").as("sum_xy"),
        ((col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double") / col("n")) / col("n"))
          .as("cov"))
  }

  /** IVF cells × int8 scan — [[ivfTopK]]'s probe structure with
    * [[quantizedTopK]]'s integer scoring: the composition production
    * ANN systems actually deploy (FAISS IVF-SQ8 shape: a coarse
    * quantizer bounds WHICH vectors are scored, scalar quantization
    * bounds what each score COSTS — at 100 TB the first keeps the
    * probe off most of the corpus, the second keeps the probed slice
    * in page cache at 4-8× density). Cell assignment runs at full
    * precision (the cheap side — one argmin per vector at build time)
    * and the per-candidate work is the exact integer dot.
    *
    * Both stages are deterministic arithmetic — double argmin cells,
    * floor-quantized values, integer-valued dots — so the ENTIRE
    * composed index replays bit-for-bit in the SQL oracle, like its
    * two parents and unlike virtually any deployed IVF-SQ8. Zero-norm
    * quantized vectors are excluded from scoring (undefined cosine),
    * matching [[quantizedTopK]]. */
  def ivfQuantizedTopK(embeddings: DataFrame, numQueries: Int = 5, k: Int = 3,
                       numCentroids: Int = 64, nprobe: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.GraftExtensions.register(embeddings.sparkSession)
    val e = embeddings.select(col("vec_id"), col("embedding").as("emb"))
      .withColumn("nrm", norm(col("emb")))
    val centroids = ivfCentroids(e, numCentroids)
    val cells = nearestCells(e, centroids, "emb", "nrm", keep = 1)
      .withColumn("q", quantize(col("emb")))
      .withColumn("nq", dot(col("q"), col("q")))
      .filter(col("nq") > 0.0)
      .select(col("vec_id"), col("cell"), col("q"), col("nq"))
    val probes = nearestCells(
      e.filter(col("vec_id") < numQueries)
        .select(col("vec_id").as("query_id"), col("emb").as("qemb"), col("nrm").as("qnrm")),
      centroids, "qemb", "qnrm", keep = nprobe)
      .withColumn("qq", quantize(col("qemb")))
      .withColumn("qnq", dot(col("qq"), col("qq")))
      .filter(col("qnq") > 0.0)
      .select(col("query_id"), col("cell"), col("qq"), col("qnq"))
    cells.join(probes, Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      // narrow before the dedup aggregate, same reasoning as ivfTopK
      .withColumn("cos_q", dot(col("qq"), col("q")) / (sqrt(col("qnq")) * sqrt(col("nq"))))
      .select(col("query_id"), col("vec_id"), col("cos_q"))
      .dropDuplicates("query_id", "vec_id")
      .withColumn("rank",
        row_number().over(Window.partitionBy(col("query_id"))
          .orderBy(col("cos_q").desc, col("vec_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), col("cos_q").as("cosine_q"), col("rank"))
  }

  /** Recall@k report of an approximate top-k against the exact
    * brute-force top-k: per query, the exact hit-set size, how many of
    * those hits the approximate index returned, and the k-th exact
    * cosine (the similarity boundary the index had to clear). This
    * turns the ANN cross-validation contract into oracle-checkable
    * integers: with parameters that reach full recall on a corpus, the
    * oracle pins `hits = exact_k` from the DATA side, so a bucketing
    * or probe regression drops `hits` and hash-mismatches.
    *
    * Scale shape: both inputs are O(queries × k) rows — the join and
    * aggregate are negligible next to producing them; nothing
    * corpus-sized is touched here. */
  def recallAtK(approx: DataFrame, exact: DataFrame): DataFrame =
    exact.select(col("query_id"), col("vec_id"), col("cosine"))
      .join(approx.select(col("query_id"), col("vec_id"), lit(1L).as("hit")),
        Seq("query_id", "vec_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("exact_k"),
        sum(coalesce(col("hit"), lit(0L))).as("hits"),
        min(col("cosine")).as("kth_cosine"))

  /** Embedding-cosine near-dup pairs, blocked on a key (here the
    * `label` column — in production a coarse quantization cell): exact
    * within the block, never all-pairs across the corpus.
    *
    * Work is Σ |block|² — the blocking key MUST bound block size
    * (IVF-style cells do; free-form labels may not). For blocks too
    * large to pair exactly, switch to the sub-quadratic candidates of
    * [[lshTopK]]'s SRP buckets or [[graft.operators.Dedup.minhashPairs]]
    * — accepting their recall contract instead of exactness. */
  def embeddingDedupPairs(embeddings: DataFrame, threshold: Double = 0.4): DataFrame = {
    graft.GraftExtensions.register(embeddings.sparkSession)
    val e = embeddings.select(col("vec_id"), col("label"), col("embedding").as("emb"))
      .withColumn("nrm", norm(col("emb")))
    e.as("a")
      .join(e.as("b"), col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", dot(col("a.emb"), col("b.emb")) / (col("a.nrm") * col("b.nrm")))
      .filter(col("cos") >= threshold)
      .select(col("a.vec_id").as("vec_id_1"), col("b.vec_id").as("vec_id_2"),
        col("a.label").as("label"), col("cos").as("cosine"))
  }

  /** SemDeDup-shaped semantic dedup (Abbas et al. 2023: cluster the
    * embeddings coarsely, then pair exactly ONLY within a cluster):
    * the blocking key is the nearest cell of the SAME deterministic
    * IVF coarse quantizer [[ivfTopK]] uses — so unlike
    * [[embeddingDedupPairs]] (which trusts a given label column) this
    * needs no labels and the block sizes are bounded by the quantizer
    * fan-out, not by whatever a free-form label happens to contain.
    *
    * Scale shape: cell assignment is a map-side argmin against a
    * constant-size broadcast centroid row ([[nearestCells]]); the
    * pair join shuffles on cell id and the work is Σ |cell|² — the
    * documented SemDeDup trade, tuned by `numCentroids` (more cells →
    * smaller blocks → less pairing work, lower recall across cell
    * boundaries). Because the quantizer is pure deterministic double
    * arithmetic with no JVM hash anywhere, the ENTIRE path — cell
    * choice included — replays bit-for-bit in the SQL oracle, which
    * almost no semantic-dedup implementation can claim.
    *
    * `trainIters > 0` swaps the seed quantizer for Lloyd's-refined
    * centroids ([[kmeansCentroids]]): better-centered cells put true
    * neighbors in the SAME cell more often, so fewer near-dup pairs
    * are missed at the same fan-out — training time buys recall
    * without touching the pairing cost model. With `deterministic`
    * the trained path stays fully oracle-replayable. */
  def semanticDedupPairs(embeddings: DataFrame, numCentroids: Int = 64,
                         threshold: Double = 0.35, trainIters: Int = 0,
                         deterministic: Boolean = false): DataFrame = {
    graft.GraftExtensions.register(embeddings.sparkSession)
    val e = embeddings.select(col("vec_id"), col("embedding").as("emb"))
      .withColumn("nrm", norm(col("emb")))
    val centroids =
      if (trainIters > 0) kmeansCentroids(e, numCentroids, trainIters, deterministic)
      else ivfCentroids(e, numCentroids)
    val cells = nearestCells(e, centroids, "emb", "nrm", keep = 1)
    cells.as("a")
      .join(cells.as("b"), col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", dot(col("a.emb"), col("b.emb")) / (col("a.nrm") * col("b.nrm")))
      .filter(col("cos") >= threshold)
      .select(col("a.vec_id").as("vec_id_1"), col("b.vec_id").as("vec_id_2"),
        col("a.cell").as("cell"), col("cos").as("cosine"))
  }

  /** [[semanticDedupPairs]] with a HARD CAP on cell population — the
    * viral-cell guard: one dense cluster (boilerplate embeddings, a
    * template family) otherwise concentrates the corpus in one cell
    * and its \|cell\|² pair term dominates the job. Members subdivide
    * by rank-within-cell: subcell = (row_number over (cell, vec_id) −
    * 1) div cap, so every subcell holds EXACTLY `cap` members (last
    * one partial) for ANY id distribution, and worst-case pair work
    * per cell is ≈ \|cell\|·cap/2 — LINEAR in the viral cell's
    * population, not quadratic. (An id-modulo split looks balanced on
    * contiguous ids but collapses to one subcell when ids arrive
    * strided or sparse — post-dedup gaps, sharded allocators — which
    * is precisely the production shape.) The rank window rides the
    * same cell-keyed shuffle the pair join needs anyway, and both
    * engines replay ROW_NUMBER over (cell, vec_id) bit-for-bit.
    * Cross-subcell pairs inside a subdivided cell are deliberately
    * not generated — the same recall-for-boundedness trade as the
    * posting-list df cap ([[graft.functions.BoundedCollect]]), and
    * exactly the cells where near-everything pairs with
    * near-everything anyway (the canonical-keep stage needs ONE
    * surviving representative, not every edge). */
  def semanticDedupPairsCapped(embeddings: DataFrame, numCentroids: Int = 64,
                               threshold: Double = 0.35, cap: Int = 16): DataFrame = {
    require(cap >= 1)
    graft.GraftExtensions.register(embeddings.sparkSession)
    val e = embeddings.select(col("vec_id"), col("embedding").as("emb"))
      .withColumn("nrm", norm(col("emb")))
    val cells = nearestCells(e, ivfCentroids(e, numCentroids), "emb", "nrm", keep = 1)
    val sub = cells.withColumn("subcell",
      expr(s"(row_number() OVER (PARTITION BY cell ORDER BY vec_id) - 1) div $cap"))
    sub.as("a")
      .join(sub.as("b"),
        col("a.cell") === col("b.cell") && col("a.subcell") === col("b.subcell") &&
          col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", dot(col("a.emb"), col("b.emb")) / (col("a.nrm") * col("b.nrm")))
      .filter(col("cos") >= threshold)
      .select(col("a.vec_id").as("vec_id_1"), col("b.vec_id").as("vec_id_2"),
        col("a.cell").as("cell"), col("cos").as("cosine"))
  }

  /** [[semanticDedupPairs]] with the fan-out SCALED to the corpus:
    * `k = max(minCentroids, ceil(sqrt(N)))` — the classic balanced
    * IVF choice. At fixed k the within-cell pair work grows as
    * N²/k (each cell's population scales with N); at k = √N both the
    * assignment cost (N·k dots) and the pair cost (≈ N²/k) grow as
    * N^1.5 — the measured 100× ScaleCheck gap between
    * `dedup_semantic` (fixed 64) and this. The derivation is one
    * metadata-cheap count action, replayed in the oracle as a scalar
    * subquery, so the scaled path stays bit-replayable end-to-end.
    * Beyond ~1e9 vectors the √N centroid broadcast itself gets big
    * (≈ 32k vectors/GB at 64 dims); that regime wants the trained
    * hierarchical quantizer ([[kmeansCentroids]] over a sampled seed)
    * — the knob composes, the plan shape is unchanged.
    *
    * `trainIters > 0` composes BOTH production knobs in one path: the
    * √N fan-out bounds pair work at N^1.5 and Lloyd's refinement
    * centers the cells at that fan-out (training cost per round is the
    * same broadcast argmin + k·dims-row re-center the fixed-k trained
    * path pays, with k now √N). With `deterministic` the composition
    * stays bit-replayable end-to-end — the oracle derives the SAME k
    * from a scalar subquery and unrolls the same Lloyd rounds. */
  def semanticDedupPairsScaled(embeddings: DataFrame, threshold: Double = 0.35,
                               minCentroids: Int = 16, trainIters: Int = 0,
                               deterministic: Boolean = false): DataFrame = {
    val n = embeddings.count()
    val k = math.max(minCentroids, math.ceil(math.sqrt(n.toDouble)).toInt)
    semanticDedupPairs(embeddings, numCentroids = k, threshold = threshold,
      trainIters = trainIters, deterministic = deterministic)
  }

  /** Embedding-space decontamination — [[graft.operators.TextOps]]'
    * n-gram `decontam_overlap` catches verbatim eval leakage, but a
    * paraphrased or re-translated eval document shares no n-grams
    * with its source; its EMBEDDING still sits next to it. This is
    * the semantic arm of the same guard: flag every train vector
    * whose cosine to ANY holdout vector reaches `threshold`, blocked
    * on the deterministic IVF cells of [[ivfTopK]]'s quantizer (the
    * SemDeDup blocking of [[semanticDedupPairs]], applied CROSS-SET:
    * train×holdout inside a cell, never train×train).
    *
    * The holdout membership rule is the engine-portable md5 bucket of
    * [[graft.operators.TextOps.hashSplit]] (4 hex chars, ~`holdoutHex`
    * /0x10000 of vectors), so the split is stable under re-runs and
    * corpus growth and the SQL oracle replays it verbatim. Per
    * flagged train vector: its nearest offending holdout vector
    * (ties to the lower id), that cosine, and how many holdout
    * vectors it collides with — the evidence row a curation run
    * attaches to each dropped document.
    *
    * Scale shape: cell assignment is the map-side broadcast argmin
    * ([[nearestCells]]); the only corpus-scale shuffle is the
    * cell-keyed join, whose probe side is the ~5% holdout slice; work
    * is Σ |cell_train|·|cell_holdout| — bounded by the quantizer
    * fan-out like SemDeDup, never all-pairs. The per-vector argmax is
    * a single max-of-struct aggregate (no window over the corpus). */
  def semanticDecontam(embeddings: DataFrame, numCentroids: Int = 64,
                       threshold: Double = 0.35,
                       holdoutHex: String = "0ccd",
                       trainIters: Int = 0,
                       deterministic: Boolean = false): DataFrame = {
    graft.GraftExtensions.register(embeddings.sparkSession)
    val e = embeddings.select(col("vec_id"), col("embedding").as("emb"))
      .withColumn("nrm", norm(col("emb")))
    val centroids =
      if (trainIters > 0) kmeansCentroids(e, numCentroids, trainIters, deterministic)
      else ivfCentroids(e, numCentroids)
    val cells = nearestCells(e, centroids, "emb", "nrm", keep = 1)
      .withColumn("is_holdout",
        substring(md5(col("vec_id").cast("string")), 1, 4) < holdoutHex)
    val train = cells.filter(!col("is_holdout"))
    val holdout = cells.filter(col("is_holdout"))
      .select(col("vec_id").as("h_id"), col("emb").as("h_emb"),
        col("nrm").as("h_nrm"), col("cell"))
    train.join(holdout, Seq("cell"))
      .withColumn("cos", dot(col("emb"), col("h_emb")) / (col("nrm") * col("h_nrm")))
      .filter(col("cos") >= threshold)
      .select(col("vec_id"), col("h_id"), col("cos"))
      .groupBy(col("vec_id"))
      .agg(
        max(struct(col("cos"), (-col("h_id")).as("neg"), col("h_id"))).as("best"),
        count(lit(1)).as("matches"))
      .select(col("vec_id"), col("best.h_id").as("holdout_id"),
        col("best.cos").as("cosine"), col("matches"))
  }

  /** Rank-seeded centroid row for corpora with ARBITRARY ids: the k
    * lowest doc_ids become cells 0..k-1 (in id order). [[ivfCentroids]]
    * seeds by `vec_id < k`, which requires the dense 0..N id space of
    * the embeddings table; a real accepted corpus keys by whatever
    * doc_ids survived curation. TakeOrdered-k bounds the seed scan
    * (no global sort materializes); the rank window runs over k rows. */
  private[graft] def seedCentroidsByRank(e: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    e.orderBy(col("vec_id")).limit(k)
      .select((row_number().over(Window.orderBy(col("vec_id"))) - 1)
        .cast("long").as("cell"),
        asDouble(col("emb")).as("cemb"), col("nrm").as("cnrm"))
      .agg(collect_list(struct(col("cell"), col("cemb"), col("cnrm"))).as("cents"))
  }

  /** Train + persist the cross-run SEMANTIC dedup index over an
    * accepted corpus's vectors — the embedding arm of the incremental
    * ingest state, next to [[graft.operators.Dedup.writeBandPostings]]
    * (whole-doc shingles) and
    * [[graft.operators.Dedup.writeChunkPostings]] (passages): a
    * PARAPHRASED re-delivery shares no shingles and no CDC chunks
    * with its source, so both text arms are structurally blind to it;
    * its embedding still lands in the same quantizer cell.
    *
    * Writes two tables: `<table>` — every corpus vector with its
    * assigned cell, BUCKETED on `cell` so the daily probe join reads
    * the corpus side with zero exchange — and `<table>__centroids`
    * — the k trained centroids (constant-size; the probe broadcasts
    * it). Training is [[kmeansCentroids]] from the rank-based seed;
    * at 100 TB each Lloyd round is the map-side broadcast argmin plus
    * a k×dims-row combinable re-center, and it runs ONCE at bootstrap
    * — daily deltas never retrain, they probe. */
  def writeSemanticIndex(vectors: DataFrame, table: String,
                         numCentroids: Int = 64, trainIters: Int = 3,
                         buckets: Int = 64, deterministic: Boolean = false): Unit = {
    graft.GraftExtensions.register(vectors.sparkSession)
    val e = vectors.select(col("doc_id").as("vec_id"), col("embedding").as("emb"))
      .withColumn("nrm", norm(col("emb")))
    // deterministic = true (the accept-preview audit's bootstrap):
    // re-center means fold members in vec_id order, so a DuckDB
    // oracle replays the trained quantizer bit-for-bit — same knob,
    // same price as every other oracle-checked training path
    val cents = kmeansCentroids(e, numCentroids, trainIters, deterministic,
      seed = Some(seedCentroidsByRank(e, numCentroids)))
    cents.select(explode(col("cents")).as("c"))
      .select(col("c.cell").as("cell"), col("c.cemb").as("cemb"),
        col("c.cnrm").as("cnrm"))
      .write.mode("overwrite").format("parquet")
      .saveAsTable(table + "__centroids")
    graft.sources.Sinks.writeBucketed(
      semanticIndexRows(vectors,
        vectors.sparkSession.table(table + "__centroids")),
      table, Seq("cell"), buckets)
  }

  /** Cell-index rows for a batch of vectors against the PERSISTED
    * centroids — the shape [[writeSemanticIndex]] writes and an
    * incremental append adds: (doc_id, cell, emb, nrm), assignment by
    * the same map-side broadcast argmin as every quantizer consumer. */
  def semanticIndexRows(vectors: DataFrame, centroids: DataFrame): DataFrame = {
    graft.GraftExtensions.register(vectors.sparkSession)
    val cents = centroids
      .agg(collect_list(struct(col("cell"), col("cemb"), col("cnrm"))).as("cents"))
    val e = vectors.select(col("doc_id").as("vec_id"), col("embedding").as("emb"))
      .withColumn("nrm", norm(col("emb")))
    nearestCells(e, cents, "emb", "nrm", keep = 1)
      .select(col("vec_id").as("doc_id"), col("cell"),
        asDouble(col("emb")).as("emb"), col("nrm"))
  }

  /** Incremental semantic near-dup probe: delta vectors against the
    * persisted [[writeSemanticIndex]] — assign each delta vector to
    * its `nprobe` nearest persisted cells (broadcast argmin over the
    * constant-size centroid table), join the bucketed corpus index on
    * `cell` (zero corpus-side exchange — only the day's delta
    * shuffles), exact cosine inside the cell. One row per
    * (delta doc, corpus doc) at `threshold`, with the best cosine as
    * evidence. `nprobe > 1` buys cross-boundary recall at probe time
    * for delta-sized cost — the knob a fixed corpus index has that
    * recomputed SemDeDup blocking lacks. */
  def incrementalSemanticMatches(newVecs: DataFrame, cellIndex: DataFrame,
                                 centroids: DataFrame,
                                 threshold: Double = 0.35,
                                 nprobe: Int = 1): DataFrame =
    semanticProbeRows(newVecs, cellIndex, centroids, threshold, nprobe)
      .groupBy(col("delta_doc"), col("corpus_doc"))
      .agg(max(col("cos")).as("cosine"))

  /** The probe's candidate core, SHARED between the batch arm above
    * and [[graft.streaming.Streams.semanticProbeStream]] — cell
    * assignment, index join, self-pair filter, cosine and threshold
    * live in exactly one place, so the spec-pinned stream == batch
    * contract cannot drift when a knob changes. At `nprobe = 1` the
    * emitted (delta_doc, corpus_doc) pairs are already unique (one
    * cell per delta vector, one index row per corpus member); the
    * batch wrapper's max-aggregate matters only for `nprobe > 1`. */
  private[graft] def semanticProbeRows(newVecs: DataFrame, cellIndex: DataFrame,
                                       centroids: DataFrame,
                                       threshold: Double,
                                       nprobe: Int): DataFrame = {
    graft.GraftExtensions.register(newVecs.sparkSession)
    val cents = centroids
      .agg(collect_list(struct(col("cell"), col("cemb"), col("cnrm"))).as("cents"))
    val d = newVecs.select(col("doc_id").as("vec_id"), col("embedding").as("emb"))
      .withColumn("nrm", norm(col("emb")))
    nearestCells(d, cents, "emb", "nrm", keep = nprobe)
      .select(col("vec_id").as("delta_doc"), col("emb"), col("nrm"), col("cell"))
      .join(cellIndex.select(col("doc_id").as("corpus_doc"), col("cell"),
        col("emb").as("c_emb"), col("nrm").as("c_nrm")), Seq("cell"))
      .filter(col("corpus_doc") =!= col("delta_doc"))
      .withColumn("cos", dot(col("emb"), col("c_emb")) / (col("nrm") * col("c_nrm")))
      .filter(col("cos") >= threshold)
  }

  /** The DAILY-INGEST SEMANTIC PROBE as a registered, oracle-checkable
    * query: carve a pseudo-delta out of the embeddings table with the
    * engine-portable 4-hex md5 rule (`hash_split`'s convention —
    * `substr(md5(vec_id), 1, 4) < deltaHex` ≈ 5%), train the
    * quantizer on the REMAINING corpus only (rank-seeded, because the
    * corpus ids are sparse after the split — exactly the situation
    * [[seedCentroidsByRank]] exists for and what
    * [[graft.Pipeline.bootstrapIncremental]] does), build the cell
    * index from the corpus, and probe it with the delta through the
    * LITERAL production function ([[incrementalSemanticMatches]],
    * `nprobe = 1`). This is the one path `runIncremental` runs per
    * delta that previously had only spec coverage; with
    * `deterministic = true` every stage is replayable double/hex
    * arithmetic, so DuckDB value-checks the whole probe end-to-end
    * ([[graft.OracleSql.semanticProbeSql]]).
    *
    * Scale shape is the production one by construction: training cost
    * is constant-size per-round centroid math over the corpus,
    * the index is one argmin projection per corpus vector, and the
    * probe joins delta×corpus WITHIN cells only — the corpus never
    * self-joins and never re-shuffles for the delta. */
  def semanticProbe(embeddings: DataFrame, numCentroids: Int = 64,
                    trainIters: Int = 3, threshold: Double = 0.35,
                    deltaHex: String = "0ccd",
                    deterministic: Boolean = false): DataFrame = {
    graft.GraftExtensions.register(embeddings.sparkSession)
    val flagged = embeddings
      .select(col("vec_id"), col("embedding"),
        (substring(md5(col("vec_id").cast("string")), 1, 4) < deltaHex).as("is_delta"))
    val corpus = flagged.filter(!col("is_delta"))
      .select(col("vec_id").as("doc_id"), col("embedding"))
    val delta = flagged.filter(col("is_delta"))
      .select(col("vec_id").as("doc_id"), col("embedding"))
    val e = corpus.select(col("doc_id").as("vec_id"), col("embedding").as("emb"))
      .withColumn("nrm", norm(col("emb")))
    val cents = kmeansCentroids(e, numCentroids, trainIters, deterministic,
      seed = Some(seedCentroidsByRank(e, numCentroids)))
    val centroids = cents.select(explode(col("cents")).as("c"))
      .select(col("c.cell").as("cell"), col("c.cemb").as("cemb"),
        col("c.cnrm").as("cnrm"))
    incrementalSemanticMatches(delta, semanticIndexRows(corpus, centroids),
      centroids, threshold, nprobe = 1)
  }

  /** Embedding-table sanity report — the check an embedding pipeline
    * runs before anything consumes the vectors: per dimensionality
    * (ragged tables show up as extra rows), vector count, norm range,
    * and how many vectors are non-unit or all-zero (both break
    * cosine math downstream: zero norms divide by zero, mixed norms
    * mean dot ≠ cosine). One map-side projection (native codegen'd
    * norm, computed once per vector) + one combinable aggregate;
    * min/max of deterministic doubles are partitioning-independent,
    * unlike a double sum/avg, which is deliberately NOT reported. */
  def embeddingNormStats(embeddings: DataFrame, unitTol: Double = 1e-3): DataFrame = {
    graft.GraftExtensions.register(embeddings.sparkSession)
    embeddings
      .select(size(col("embedding")).cast("long").as("dim"),
        norm(col("embedding")).as("nrm"))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("vectors"),
        min(col("nrm")).as("min_norm"),
        max(col("nrm")).as("max_norm"),
        sum(when(abs(col("nrm") - 1.0) > unitTol, 1L).otherwise(0L)).as("non_unit"),
        sum(when(col("nrm") === 0.0, 1L).otherwise(0L)).as("zero_vectors"))
  }
}
