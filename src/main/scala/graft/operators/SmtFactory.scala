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
  * destination), Filter / filter (`condition` keeps matching rows).
  * Unknown types fail at assembly — startup, not runtime.
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
      val base = tpe.split("\\.").last match {
        case "ExtractNewRecordState" | "unwrap" =>
          Smt(n, df => EventShaping.extractNewRecordState(df,
            keepDeletes = props.get(s"$p.delete.handling.mode").contains("rewrite")))
        case "ContentBasedRouter" | "route" =>
          val e = props.getOrElse(s"$p.expression",
            throw new IllegalArgumentException(s"missing $p.expression"))
          Smt(n, df => EventShaping.route(df, expr(e)))
        case "Filter" | "filter" =>
          val e = props.getOrElse(s"$p.condition",
            throw new IllegalArgumentException(s"missing $p.condition"))
          Smt(n, df => df.filter(expr(e)))
        case other =>
          throw new IllegalArgumentException(
            s"unsupported transform type '$other' (supported: ExtractNewRecordState, ContentBasedRouter, Filter)")
      }
      base.copy(predicate = predicate, negate = negate)
    }
  }
}
