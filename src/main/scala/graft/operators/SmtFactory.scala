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
  * and the upstream Kafka-Connect SMT staples the reference's own
  * test matrix ships (RocketMqTestConfigSource.java:29-35,
  * TestConfigSource.java, InstructLabTestConfigSource.java,
  * EventHubsWithPartitionRouterProfile.java): MaskField (`fields`,
  * optional string `replacement`), ReplaceField (`exclude` drops
  * after-state fields), ValueToKey (`fields` rebuilds the key
  * struct), HeaderToValue (`headers` + `fields` copy header values
  * into after-state), HeaderFrom (`fields` + `headers` +
  * `operation=copy|move`, the reverse direction), InsertField
  * (`static.field`/`static.value`), InsertHeader (`header` +
  * `value.literal`), HoistField (`field` wraps the value),
  * ByLogicalTableRouter (`topic.regex` + `topic.replacement` with
  * $-group refs), PartitionRouting (`partition.payload.fields` +
  * `partition.topic.num`). Predicates resolve by upstream type
  * (TopicNameMatches `pattern`) or a Spark SQL `expr`. All are
  * single-projection Column algebra over the envelope
  * (`withField`/`dropFields`) — the chain still folds into one
  * codegen'd pass. Unknown types fail at assembly — startup, not
  * runtime.
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
        val pp = s"debezium.predicates.$pn"
        // upstream predicate types map to Column predicates; the
        // scripting predicate is a Spark SQL expression string
        props.get(s"$pp.type").map(_.split("\\.").last) match {
          case Some("TopicNameMatches") =>
            // upstream uses Pattern.matches (anchored full match)
            col("destination").rlike("^(?:" + props.getOrElse(s"$pp.pattern",
              throw new IllegalArgumentException(s"missing $pp.pattern")) + ")$")
          case Some(other) if !props.contains(s"$pp.expr") =>
            throw new IllegalArgumentException(
              s"unsupported predicate type '$other' (supported: TopicNameMatches, " +
                "or an expression via .expr)")
          case _ =>
            expr(props.getOrElse(s"$pp.expr",
              throw new IllegalArgumentException(s"missing $pp.expr")))
        }
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
        case "InsertHeader" | "insertheader" =>
          // headers is a map (no duplicate keys) — same-key insert is
          // last-wins, the map analog of Connect's appended header
          val h = req("header"); val v = req("value.literal")
          Smt(n, df => df.withColumn("headers", map_concat(
            map_filter(col("headers"), (k, _) => k =!= lit(h)), map(lit(h), lit(v)))))
        case "HoistField$Value" | "HoistField" | "hoist" =>
          // wrap the whole value into a single-field struct
          Smt(n, df => df.withColumn("value", struct(col("value").as(req("field")))))
        case "HeaderFrom$Value" | "HeaderFrom" | "headerfrom" =>
          // after-state fields → headers (copy keeps the field, move
          // drops it); header values are strings, so a null field
          // renders as '' (the map type disallows null values)
          val fields = list("fields"); val headers = list("headers")
          require(fields.size == headers.size,
            s"$p: 'fields' and 'headers' must pair up")
          val op = props.getOrElse(s"$p.operation", "copy")
          require(op == "copy" || op == "move", s"$p.operation must be copy|move")
          Smt(n, df => {
            val withHdrs = fields.zip(headers).foldLeft(df) { case (d, (f, h)) =>
              d.withColumn("headers", map_concat(
                map_filter(col("headers"), (k, _) => k =!= lit(h)),
                map(lit(h), coalesce(col(s"value.after.$f").cast("string"), lit("")))))
            }
            if (op == "move") withHdrs.withColumn("value",
              col("value").withField("after", col("value.after").dropFields(fields: _*)))
            else withHdrs
          })
        case "TimezoneConverter" | "timezoneconverter" =>
          // io.debezium.transforms.TimezoneConverter: re-render
          // ZonedTimestamp STRING fields at the same instant in
          // `converted.timezone`. The offset is DERIVED from the
          // conversion itself (exact across DST), so the whole rewrite
          // stays codegen'd Column algebra; rendering assumes the
          // engine-wide UTC session (GraftSession sets it).
          val tz = req("converted.timezone")
          val fields = list("include.fields")
          Smt(n, df => fields.foldLeft(df) { (d, f) =>
            val src = col(s"value.after.$f")
            val inst = to_timestamp(src)
            val local = from_utc_timestamp(inst, tz)
            val offMin = ((local.cast("long") - inst.cast("long")) / 60).cast("int")
            val offStr = concat(
              when(offMin < 0, "-").otherwise("+"),
              lpad((abs(offMin) / 60).cast("int").cast("string"), 2, "0"), lit(":"),
              lpad((abs(offMin) % 60).cast("int").cast("string"), 2, "0"))
            val rendered = when(src.isNull, lit(null).cast("string"))
              .otherwise(concat(date_format(local, "yyyy-MM-dd'T'HH:mm:ss"), offStr))
            d.withColumn("value", col("value").withField(s"after.$f", rendered))
          })
        case "ByLogicalTableRouter" | "regexrouter" =>
          // upstream: Pattern.matches(topic.regex) → replacement with
          // $1-group refs; non-matching destinations pass unchanged —
          // exactly regexp_replace over the anchored pattern
          val rx = req("topic.regex"); val repl = req("topic.replacement")
          Smt(n, df => EventShaping.route(df,
            regexp_replace(col("destination"), "^(?:" + rx + ")$", repl)))
        case "PartitionRouting" | "partitionrouting" =>
          // io.debezium.transforms.partitions.PartitionRouting:
          // payload paths (e.g. source.db, after.name) resolve against
          // the envelope; the target partition is a stable hash of the
          // joined values mod partition.topic.num. Hash algorithm is
          // ours (portable 60-bit), not Java's Objects.hash — the
          // CONTRACT (same values → same partition, uniform spread)
          // is what downstream ordering relies on, not the bit layout.
          val fields = list("partition.payload.fields")
          val num = req("partition.topic.num").toInt
          require(num > 0, s"$p.partition.topic.num must be positive")
          Smt(n, df => df.withColumn("partition",
            pmod(graft.functions.Portable.hash64(concat_ws("|",
              fields.map(f => coalesce(col(s"value.$f").cast("string"), lit(""))): _*)),
              lit(num.toLong)).cast("int")))
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
              "HeaderToValue, InsertField, InsertHeader, HoistField, HeaderFrom, " +
              "ByLogicalTableRouter, PartitionRouting, TimezoneConverter, EventRouter)")
      }
      base.copy(predicate = predicate, negate = negate)
    }
  }
}
