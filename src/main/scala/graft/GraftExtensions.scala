package graft

import org.apache.spark.sql.SparkSessionExtensions
import graft.etl.expressions.{ArrayDot, JsonResidualVariant, JsonToStringMap, LshSignBands, MapRemoveKeys, MinHashSig, PqAdc, Rfc3339Parse, SortedAsofIndex}

/** SparkSessionExtensions entry point: registers the engine's custom
  * expressions as SQL functions, so `spark.sql` users get them too:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions)...
  * // or: --conf spark.sql.extensions=graft.GraftExtensions
  * spark.sql("SELECT json_to_string_map(line) FROM logs")
  * spark.sql("SELECT map_remove_keys(fields, 'user_email', 'token') FROM t")
  * spark.sql("SELECT array_dot(a, b), rfc3339_parse(ts).rendered FROM t")
  * spark.sql("SELECT json_residual_variant(line, 'ts', 'msg') FROM logs")
  * spark.sql("SELECT lsh_sign_bands(CAST(e AS ARRAY<DOUBLE>), 128, 4) FROM v")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
  import org.apache.spark.unsafe.types.UTF8String

  private def arity(fn: String, args: Seq[Expression], min: Int,
      max: Int): Unit =
    if (args.length < min || args.length > max)
      throw new IllegalArgumentException(
        s"$fn expects ${if (min == max) s"$min" else s"$min to $max"} " +
          s"argument(s), got ${args.length}")

  private def litString(fn: String)(e: Expression): String = e match {
    case Literal(s: UTF8String, _) => s.toString
    case other => throw new IllegalArgumentException(
      s"$fn: argument must be a string literal, got $other")
  }

  private def litInt(fn: String)(e: Expression): Int = e match {
    case Literal(i: Int, _) => i
    case other => throw new IllegalArgumentException(
      s"$fn: argument must be an integer literal, got $other")
  }

  def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("json_to_string_map"),
      new ExpressionInfo(classOf[JsonToStringMap].getName, "json_to_string_map"),
      (args: Seq[Expression]) => {
        arity("json_to_string_map", args, 1, 1)
        JsonToStringMap(args.head)
      }))
    e.injectFunction((
      FunctionIdentifier("map_remove_keys"),
      new ExpressionInfo(classOf[MapRemoveKeys].getName, "map_remove_keys"),
      (args: Seq[Expression]) => {
        arity("map_remove_keys", args, 2, Int.MaxValue)
        MapRemoveKeys(args.head, args.tail.map(litString("map_remove_keys")))
      }))
    e.injectFunction((
      FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDot].getName, "array_dot"),
      (args: Seq[Expression]) => {
        arity("array_dot", args, 2, 2)
        ArrayDot(args.head, args(1))
      }))
    e.injectFunction((
      FunctionIdentifier("rfc3339_parse"),
      new ExpressionInfo(classOf[Rfc3339Parse].getName, "rfc3339_parse"),
      (args: Seq[Expression]) => {
        arity("rfc3339_parse", args, 1, 1)
        Rfc3339Parse(args.head)
      }))
    e.injectFunction((
      FunctionIdentifier("json_residual_variant"),
      new ExpressionInfo(classOf[JsonResidualVariant].getName,
        "json_residual_variant"),
      (args: Seq[Expression]) => {
        arity("json_residual_variant", args, 1, Int.MaxValue)
        JsonResidualVariant(args.head,
          args.tail.map(litString("json_residual_variant")))
      }))
    e.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (args: Seq[Expression]) => {
        arity("minhash_sig", args, 2, 2)
        MinHashSig(args.head, litInt("minhash_sig")(args(1)))
      }))
    e.injectFunction((
      FunctionIdentifier("lsh_sign_bands"),
      new ExpressionInfo(classOf[LshSignBands].getName, "lsh_sign_bands"),
      (args: Seq[Expression]) => {
        arity("lsh_sign_bands", args, 3, 3)
        LshSignBands(args.head,
          litInt("lsh_sign_bands")(args(1)), litInt("lsh_sign_bands")(args(2)))
      }))
    // pq_adc(code ARRAY<INT>, lut ARRAY<ARRAY<DOUBLE>>): the ADC scan
    // loop for SQL users who store PQ codes + broadcast a LUT table.
    // (pq_encode is NOT injectable: its codebooks are a data-derived
    // reference object, not expressible as SQL literals.)
    e.injectFunction((
      FunctionIdentifier("pq_adc"),
      new ExpressionInfo(classOf[PqAdc].getName, "pq_adc"),
      (args: Seq[Expression]) => {
        arity("pq_adc", args, 2, 2)
        PqAdc(args.head, args(1))
      }))
    // sorted_asof_idx(ts BIGINT, hist ARRAY<BIGINT>): the broadcast
    // as-of binary search, for SQL users who keep per-key sorted
    // histories (pair with element_at(payload_arr, idx + 1)).
    e.injectFunction((
      FunctionIdentifier("sorted_asof_idx"),
      new ExpressionInfo(classOf[SortedAsofIndex].getName, "sorted_asof_idx"),
      (args: Seq[Expression]) => {
        arity("sorted_asof_idx", args, 2, 2)
        SortedAsofIndex(args.head, args(1))
      }))
    // bounded_top_k(key, k): the k smallest values of `key` per group
    // as an ascending array — O(k) buffer in every aggregation mode,
    // so per-group quotas map-side-combine instead of funneling hot
    // groups through a window task (the analyzer wraps the
    // AggregateFunction for SQL use; see Sampling.topKPerGroup for
    // the DataFrame quota composition).
    e.injectFunction((
      FunctionIdentifier("bounded_top_k"),
      new ExpressionInfo(classOf[graft.etl.expressions.BoundedTopK].getName,
        "bounded_top_k"),
      (args: Seq[Expression]) => {
        arity("bounded_top_k", args, 2, 2)
        graft.etl.expressions.BoundedTopK(args.head,
          litInt("bounded_top_k")(args(1)))
      }))
    // space_saving_top_k(key, capacity): bounded-memory heavy-hitters
    // summary (SpaceSaving) as array<struct<key, cnt, err>> — cnt-err
    // <= true <= cnt; err = 0 certifies exactness. The one-pass
    // top-frequent-items primitive (see Frequency.heavyHitters).
    e.injectFunction((
      FunctionIdentifier("space_saving_top_k"),
      new ExpressionInfo(classOf[graft.etl.expressions.SpaceSavingTopK].getName,
        "space_saving_top_k"),
      (args: Seq[Expression]) => {
        arity("space_saving_top_k", args, 2, 2)
        graft.etl.expressions.SpaceSavingTopK(args.head,
          litInt("space_saving_top_k")(args(1)))
      }))
    // Curation surface: the content gates as SQL functions. These are
    // compositions of built-in expressions (regexp engine is the cost,
    // not dispatch — no custom codegen needed), injected so SQL users
    // run the EXACT pipeline the Scala ops run.
    locally {
      import org.apache.spark.sql.catalyst.expressions.{ArrayTransform, LambdaFunction, Lower, RegExpExtract, RegExpExtractAll, RegExpReplace, UnresolvedNamedLambdaVariable}
      import graft.ops.TextAnalysis
      def s(v: String) = Literal.create(v)
      // catalyst builders (a DSL Column cannot cross injectFunction —
      // see CurationSqlExprs scaladoc); QueriesSpec's mirror test pins
      // SQL ≡ Column on a branch-covering probe set so the surfaces
      // cannot fork silently
      import graft.etl.expressions.CurationSqlExprs
      def inject1(name: String, b: Expression => Expression): Unit =
        e.injectFunction((
          FunctionIdentifier(name),
          new ExpressionInfo(classOf[RegExpReplace].getName, name),
          (args: Seq[Expression]) => {
            arity(name, args, 1, 1)
            b(args.head)
          }))
      inject1("scrub_pii", CurationSqlExprs.scrubPii)
      inject1("luhn_valid", CurationSqlExprs.luhnValid)
      inject1("canonical_text", CurationSqlExprs.canonicalText)
      inject1("quality_score", CurationSqlExprs.qualityScore)
      e.injectFunction((
        FunctionIdentifier("url_hosts"),
        new ExpressionInfo(classOf[RegExpExtractAll].getName, "url_hosts"),
        (args: Seq[Expression]) => {
          arity("url_hosts", args, 1, 1)
          val h = UnresolvedNamedLambdaVariable(Seq("h"))
          ArrayTransform(
            RegExpExtractAll(args.head, s(TextAnalysis.UrlHostRe),
              Literal.create(1)),
            LambdaFunction(Lower(h), Seq(h)))
        }))
      e.injectFunction((
        FunctionIdentifier("registrable_domain"),
        new ExpressionInfo(classOf[RegExpExtract].getName, "registrable_domain"),
        (args: Seq[Expression]) => {
          arity("registrable_domain", args, 1, 1)
          // single source of truth: the catalyst-level PSL lookup that
          // the Column op also wraps, so the two surfaces cannot fork
          graft.ops.PublicSuffix.registrableDomainExpr(args.head)
        }))
    }
  }
}
