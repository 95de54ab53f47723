package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.call_function

/** Registration of the engine's native expressions.
  *
  * Two install paths:
  *  - [[GraftExtensions]] for `SparkSession.builder.withExtensions`
  *    (the SparkSessionExtensions injection point — how a deployment
  *    wires the engine in via `spark.sql.extensions`);
  *  - [[ensureRegistered]] for sessions the engine doesn't build
  *    (the driver owns the session in this harness) — idempotent
  *    registration into the session's FunctionRegistry.
  */
object GraftFunctions {

  val cosineSimName = "graft_cosine_sim"
  val extractItemsName = "graft_extract_items"
  val sortedIntersectName = "graft_sorted_intersect_size"
  val wordNGramsName = "graft_word_ngrams"
  val jaroWinklerName = "graft_jaro_winkler"
  val bpeEncodeName = "graft_bpe_encode"
  val bloomHitsAnyName = "graft_bloom_hits_any"
  val dvAliveName = "graft_dv_alive"

  private def dvAliveInfo = new ExpressionInfo(
    classOf[DvAlive].getName, dvAliveName)

  private def dvAliveBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 4, s"$dvAliveName expects 4 arguments")
    def litStr(e: Expression, what: String): String = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v, _)
          if v != null => v.toString
      case other => throw new IllegalArgumentException(
        s"$dvAliveName: $what must be a string literal, got $other")
    }
    DvAlive(args.head, args(1), litStr(args(2), "root"),
      litStr(args(3), "epoch"))
  }

  private def bpeEncodeInfo = new ExpressionInfo(
    classOf[BpeEncode].getName, bpeEncodeName)

  private def bpeEncodeBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2, s"$bpeEncodeName expects 2 arguments")
    BpeEncode(args.head, args(1))
  }

  private def jaroWinklerInfo = new ExpressionInfo(
    classOf[JaroWinkler].getName, jaroWinklerName)

  private def jaroWinklerBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2, s"$jaroWinklerName expects 2 arguments")
    JaroWinkler(args.head, args(1))
  }

  private def cosineInfo = new ExpressionInfo(
    classOf[CosineSimilarity].getName, cosineSimName)

  private def cosineBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2, s"$cosineSimName expects 2 arguments")
    CosineSimilarity(args.head, args(1))
  }

  private def extractInfo = new ExpressionInfo(
    classOf[ExtractItems].getName, extractItemsName)

  private def extractBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 1, s"$extractItemsName expects 1 argument")
    ExtractItems(args.head)
  }

  private def sortedIntersectInfo = new ExpressionInfo(
    classOf[SortedLongIntersectSize].getName, sortedIntersectName)

  private def sortedIntersectBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2, s"$sortedIntersectName expects 2 arguments")
    SortedLongIntersectSize(args.head, args(1))
  }

  private def wordNGramsInfo = new ExpressionInfo(
    classOf[WordNGrams].getName, wordNGramsName)

  private def wordNGramsBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2, s"$wordNGramsName expects 2 arguments")
    val n = args(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"$wordNGramsName: n must be an integer literal, got $other")
    }
    WordNGrams(args.head, n)
  }

  private def bloomHitsAnyInfo = new ExpressionInfo(
    classOf[BloomHitsAny].getName, bloomHitsAnyName)

  private def bloomHitsAnyBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2, s"$bloomHitsAnyName expects 2 arguments")
    BloomHitsAny(args.head, args(1))
  }

  def install(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier(bloomHitsAnyName),
      bloomHitsAnyInfo, bloomHitsAnyBuilder _))
    ext.injectFunction((FunctionIdentifier(cosineSimName), cosineInfo, cosineBuilder _))
    ext.injectFunction((FunctionIdentifier(extractItemsName), extractInfo, extractBuilder _))
    ext.injectFunction((FunctionIdentifier(sortedIntersectName),
      sortedIntersectInfo, sortedIntersectBuilder _))
    ext.injectFunction((FunctionIdentifier(wordNGramsName),
      wordNGramsInfo, wordNGramsBuilder _))
    ext.injectFunction((FunctionIdentifier(jaroWinklerName),
      jaroWinklerInfo, jaroWinklerBuilder _))
    ext.injectFunction((FunctionIdentifier(bpeEncodeName),
      bpeEncodeInfo, bpeEncodeBuilder _))
    ext.injectFunction((FunctionIdentifier(dvAliveName),
      dvAliveInfo, dvAliveBuilder _))
  }

  /** Idempotent per-session registration (safe to call per query). */
  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val cid = FunctionIdentifier(cosineSimName)
    if (!registry.functionExists(cid))
      registry.registerFunction(cid, cosineInfo, cosineBuilder _)
    val gid = FunctionIdentifier(extractItemsName)
    if (!registry.functionExists(gid))
      registry.registerFunction(gid, extractInfo, extractBuilder _)
    val sid = FunctionIdentifier(sortedIntersectName)
    if (!registry.functionExists(sid))
      registry.registerFunction(sid, sortedIntersectInfo, sortedIntersectBuilder _)
    val nid = FunctionIdentifier(wordNGramsName)
    if (!registry.functionExists(nid))
      registry.registerFunction(nid, wordNGramsInfo, wordNGramsBuilder _)
    val jid = FunctionIdentifier(jaroWinklerName)
    if (!registry.functionExists(jid))
      registry.registerFunction(jid, jaroWinklerInfo, jaroWinklerBuilder _)
    val bid = FunctionIdentifier(bpeEncodeName)
    if (!registry.functionExists(bid))
      registry.registerFunction(bid, bpeEncodeInfo, bpeEncodeBuilder _)
    val bhid = FunctionIdentifier(bloomHitsAnyName)
    if (!registry.functionExists(bhid))
      registry.registerFunction(bhid, bloomHitsAnyInfo, bloomHitsAnyBuilder _)
    val dvid = FunctionIdentifier(dvAliveName)
    if (!registry.functionExists(dvid))
      registry.registerFunction(dvid, dvAliveInfo, dvAliveBuilder _)
  }

  /** Column-API form of the bloom sidecar probe expression. */
  def bloomHitsAny(spark: SparkSession, bloom: Column, keys: Column): Column = {
    ensureRegistered(spark)
    call_function(bloomHitsAnyName, bloom, keys)
  }

  /** Column-API form of the deletion-vector mask predicate: row
    * (file, pos) of the DV table at `root` is NOT tombstoned. Each
    * call mints a fresh epoch — the mask reflects the delta state as
    * of this construction (see [[DvAlive]]'s epoch contract).
    */
  def dvAlive(spark: SparkSession, file: Column, pos: Column,
      root: String): Column = {
    ensureRegistered(spark)
    call_function(dvAliveName, file, pos,
      org.apache.spark.sql.functions.lit(root),
      org.apache.spark.sql.functions.lit(
        java.util.UUID.randomUUID().toString))
  }

  /** Column-API form of the native cosine expression. */
  def cosineSim(spark: SparkSession, a: Column, b: Column): Column = {
    ensureRegistered(spark)
    call_function(cosineSimName, a, b)
  }

  /** Column-API form of the sorted-array intersection-size expression. */
  def sortedIntersectSize(spark: SparkSession, a: Column, b: Column): Column = {
    ensureRegistered(spark)
    call_function(sortedIntersectName, a, b)
  }

  /** Column-API form of the native n-gram expression. */
  def wordNGrams(spark: SparkSession, words: Column, n: Int): Column = {
    ensureRegistered(spark)
    call_function(wordNGramsName, words, org.apache.spark.sql.functions.lit(n))
  }

  /** Column-API form of the native Jaro-Winkler expression. */
  def jaroWinkler(spark: SparkSession, a: Column, b: Column): Column = {
    ensureRegistered(spark)
    call_function(jaroWinklerName, a, b)
  }

  /** Column-API form of the native greedy-BPE-encode expression. */
  def bpeEncode(spark: SparkSession, word: Column, vocab: Column): Column = {
    ensureRegistered(spark)
    call_function(bpeEncodeName, word, vocab)
  }
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` entry point:
  * native expressions + custom-operator planner strategies. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.install(ext)
    graft.plans.GraftPlans.install(ext)
  }
}
