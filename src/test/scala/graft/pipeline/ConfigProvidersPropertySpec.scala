package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import java.nio.file.Files

/** Randomized sweeps over the config-provider resolution invariants —
  * the contracts a deployment leans on without ever reading the code
  * (deterministic scalacheck seeds, the HtmlPropertySpec pattern):
  *
  *  1. NO-PLACEHOLDER IDENTITY: values without complete `${p:k}`
  *     syntax pass through byte-for-byte, whatever bytes they carry
  *     (URLs with colons, JSON, `$` signs, stray braces);
  *  2. SECRET CONTAINMENT: no masked view ever contains a resolved
  *     secret, for ANY generated secret bytes;
  *  3. UNDECLARED PASS-THROUGH: placeholders of undeclared providers
  *     survive unmodified, Quarkus guard included — someone else's
  *     syntax is not ours to mutate.
  */
class ConfigProvidersPropertySpec extends AnyFunSuite {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default.withSize(40), Seed(seed)).getOrElse(sys.error("gen failed"))

  private val plainValue: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr,
    Gen.asciiPrintableStr.map(_.filter(c => c != '$' && c != '{' && c != '}')),
    Gen.oneOf("jdbc:postgresql://h:5432/db?ssl=true", "a=b&c=d", "{json:1}",
      "pa$$word", "$HOME", "${unterminated", "tail}", "a:b:c", ""))

  private val keyGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaLowerChar).map(cs => "debezium.x." + cs.mkString.take(12))

  test("values without complete placeholder syntax pass through byte-for-byte") {
    val declared = Map(
      "debezium.source.config.providers" -> "env",
      "debezium.source.config.providers.env.class" ->
        "org.apache.kafka.common.config.provider.EnvVarConfigProvider")
    (1L to 200L).foreach { seed =>
      val m = sample(Gen.mapOf(Gen.zip(keyGen, plainValue)), seed)
      val r = PipelineConfig.resolveProviders(declared ++ m, env = Map.empty)
      m.foreach { case (k, v) =>
        assert(r.props(k) == v, s"seed $seed: value mutated for $k: '${r.props(k)}' != '$v'")
        assert(r.masked(k) == v, s"seed $seed: non-secret masked for $k")
      }
    }
  }

  test("masked views never leak any resolved secret") {
    val dir = Files.createTempDirectory("graft-prop-secrets")
    val secretGen = Gen.zip(
      Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString.take(10)),
      Gen.nonEmptyListOf(Gen.alphaNumChar).map("s3-" + _.mkString.take(24)))
    (1L to 60L).foreach { seed =>
      val secrets = sample(Gen.nonEmptyListOf(secretGen), seed).toMap
      val f = dir.resolve(s"s$seed.properties")
      Files.writeString(f, secrets.map { case (k, v) => s"$k=$v" }.mkString("\n") + "\n")
      val props = Map(
        "debezium.source.config.providers" -> "file",
        "debezium.source.config.providers.file.class" ->
          "org.apache.kafka.common.config.provider.FileConfigProvider") ++
        secrets.keys.map(k => s"debezium.cred.$k" -> ("${file:" + f + ":" + k + "}")).toMap
      val r = PipelineConfig.resolveProviders(props, env = Map.empty)
      secrets.foreach { case (k, v) =>
        assert(r.props(s"debezium.cred.$k") == v) // resolved for the engine
        assert(r.masked(s"debezium.cred.$k") == PipelineConfig.SecretMask)
      }
      val maskedText = r.masked.values.mkString("\n")
      secrets.values.foreach(v =>
        assert(!maskedText.contains(v), s"seed $seed: masked view leaked '$v'"))
    }
  }

  test("undeclared-provider placeholders survive byte-for-byte, guard included") {
    val base = Map(
      "debezium.source.config.providers" -> "env",
      "debezium.source.config.providers.env.class" ->
        "org.apache.kafka.common.config.provider.EnvVarConfigProvider")
    val placeholder = for {
      p <- Gen.oneOf("vault", "aws", "azure", "custom9")
      path <- Gen.alphaNumStr.map(_.take(12))
      k <- Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString.take(8))
      guard <- Gen.oneOf("", "$\\$")
      prefix <- Gen.oneOf("", "user=", "Bearer ")
    } yield s"$prefix$guard$${$p:$path:$k}"
    (1L to 200L).foreach { seed =>
      val v = sample(placeholder, seed)
      val r = PipelineConfig.resolveProviders(
        base + ("debezium.source.custom" -> v), env = Map.empty)
      assert(r.props("debezium.source.custom") == v, s"seed $seed: mutated '$v'")
      assert(r.masked("debezium.source.custom") == v, s"seed $seed: masked '$v'")
    }
  }
}
