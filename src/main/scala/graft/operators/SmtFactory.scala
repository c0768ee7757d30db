package graft.operators

import org.apache.spark.sql.functions._
import graft.operators.EventShaping.Smt

/** Config-driven SMT chain assembly — the reference's
  * `debezium.transforms.*` + `debezium.predicates.*` pass-through
  * (DebeziumServerConfigSourceFactory.java:107-117), rebuilt with
  * Spark SQL expression strings where the reference uses scripting
  * SMTs (the Groovy filter/router shipped in
  * debezium-server-dist/pom.xml:389-393):
  *
  *   debezium.transforms = unwrap,rt
  *   debezium.transforms.unwrap.type = ExtractNewRecordState
  *   debezium.transforms.rt.type = ContentBasedRouter
  *   debezium.transforms.rt.expression = concat(destination, '.routed')
  *   debezium.transforms.rt.predicate = isbig
  *   debezium.transforms.rt.negate = true
  *   debezium.predicates.isbig.expr = value.after.amount > 100
  *
  * Supported types (short or class-style names): ExtractNewRecordState
  * / unwrap, ContentBasedRouter / route (`expression` recomputes
  * destination), Filter / filter (`condition` keeps matching rows),
  * and the upstream Kafka-Connect SMT staples users ship with the
  * reference: MaskField (`fields`, optional string `replacement`),
  * ReplaceField (`exclude` drops after-state fields), ValueToKey
  * (`fields` rebuilds the key struct), HeaderToValue (`headers` +
  * `fields` copy header values into after-state), InsertField
  * (`static.field`/`static.value`). All are single-projection Column
  * algebra over the envelope (`withField`/`dropFields`) — the chain
  * still folds into one codegen'd pass. Unknown types fail at
  * assembly — startup, not runtime.
  */
object SmtFactory {

  def fromProperties(props: Map[String, String]): Seq[Smt] = {
    val names = props.get("debezium.transforms")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    names.map { n =>
      val p = s"debezium.transforms.$n"
      val tpe = props.getOrElse(s"$p.type",
        throw new IllegalArgumentException(s"missing $p.type"))
      val predicate = props.get(s"$p.predicate").map { pn =>
        val e = props.getOrElse(s"debezium.predicates.$pn.expr",
          throw new IllegalArgumentException(s"missing debezium.predicates.$pn.expr"))
        expr(e)
      }
      val negate = props.get(s"$p.negate").exists(_.toBoolean)
      def req(k: String): String = props.getOrElse(s"$p.$k",
        throw new IllegalArgumentException(s"missing $p.$k"))
      def list(k: String): Seq[String] =
        req(k).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      val base = tpe.split("\\.").last match {
        case "ExtractNewRecordState" | "unwrap" =>
          Smt(n, df => EventShaping.extractNewRecordState(df,
            keepDeletes = props.get(s"$p.delete.handling.mode").contains("rewrite")))
        case "ContentBasedRouter" | "route" =>
          Smt(n, df => EventShaping.route(df, expr(req("expression"))))
        case "Filter" | "filter" =>
          Smt(n, df => df.filter(expr(req("condition"))))
        case "MaskField" | "mask" =>
          // string fields masked with `replacement` (default null) —
          // the upstream SMT's semantics for string masking
          val repl = props.get(s"$p.replacement")
            .map(r => lit(r)).getOrElse(lit(null).cast("string"))
          Smt(n, df => list("fields").foldLeft(df)((d, f) =>
            d.withColumn("value", col("value").withField(s"after.$f", repl))))
        case "ReplaceField" | "replacefield" =>
          val excl = list("exclude")
          Smt(n, df => df.withColumn("value",
            col("value").withField("after", col("value.after").dropFields(excl: _*))))
        case "ValueToKey" | "valuetokey" =>
          // Delete envelopes carry after=null — fall back to the
          // before-image so a delete keeps the key that identifies the
          // row it removes (matches the upstream SMT on unwrapped
          // deletes; without it downstream upsert/routing sees an
          // all-null key and can't match the delete to its row).
          // Gate on the WHOLE after struct, not per field: an update
          // envelope with both images and a legitimately-NULL key field
          // in after must keep that NULL, not resurrect the stale
          // before value (upstream extracts from one image only).
          val fields = list("fields")
          Smt(n, df => df.withColumn("key",
            struct(fields.map(f =>
              when(col("value.after").isNull, col(s"value.before.$f"))
                .otherwise(col(s"value.after.$f")).as(f)): _*)))
        case "HeaderToValue" | "headertovalue" =>
          val headers = list("headers"); val fields = list("fields")
          require(headers.size == fields.size,
            s"$p: 'headers' and 'fields' must pair up")
          Smt(n, df => headers.zip(fields).foldLeft(df) { case (d, (h, f)) =>
            d.withColumn("value",
              col("value").withField(s"after.$f", element_at(col("headers"), h)))
          })
        case "InsertField" | "insertfield" =>
          Smt(n, df => df.withColumn("value",
            col("value").withField(s"after.${req("static.field")}", lit(req("static.value")))))
        case "EventRouter" | "outbox" =>
          // the upstream outbox SMT's option names, same defaults
          // (io.debezium.transforms.outbox.EventRouterConfigDefinition)
          Smt(n, df => EventShaping.outboxRoute(df,
            routeByField = props.getOrElse(s"$p.route.by.field", "aggregatetype"),
            keyField = props.getOrElse(s"$p.table.field.event.key", "aggregateid"),
            payloadField = props.getOrElse(s"$p.table.field.event.payload", "payload"),
            topicTemplate = props.getOrElse(s"$p.route.topic.replacement",
              "outbox.event.${routedByValue}")))
        case other =>
          throw new IllegalArgumentException(
            s"unsupported transform type '$other' (supported: ExtractNewRecordState, " +
              "ContentBasedRouter, Filter, MaskField, ReplaceField, ValueToKey, " +
              "HeaderToValue, InsertField, EventRouter)")
      }
      base.copy(predicate = predicate, negate = negate)
    }
  }
}
