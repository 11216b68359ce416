package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.AppConfig

/** Env-parity config (S3 in SURVEY.md §2.1): same variable names as the
  * reference, S3A wiring, derived output path.
  */
class AppConfigSpec extends AnyFunSuite {

  test("fromEnv reads the reference's exact env-var names") {
    val cfg = AppConfig.fromEnv(Map(
      "SPARK_APP_NAME" -> "app",
      "AWS_ENDPOINT_URL" -> "http://localstack:4566",
      "AWS_ACCESS_KEY_ID" -> "test",
      "AWS_SECRET_ACCESS_KEY" -> "secret",
      "AWS_REGION" -> "eu-west-1",
      "KINESIS_STREAM_NAME" -> "articles",
      "S3_BUCKET_NAME" -> "my-bucket",
      "SPARK_CHECKPOINT_LOCATION" -> "/ckpt"))
    assert(cfg.appName == "app")
    assert(cfg.resolvedOutputPath.contains("s3a://my-bucket/enriched_articles"))
    val k = cfg.kinesisSource.get
    assert(k.streamName == "articles" && k.region == "eu-west-1")
    assert(k.secretKey == "secret",
      "secret key must be the SECRET (the reference wires the access-key id here — a bug we fix)")
    assert(k.startingPosition == "TRIM_HORIZON")
  }

  test("explicit output path wins over the bucket-derived layout; empty env is fine") {
    assert(AppConfig.fromEnv(Map("GRAFT_OUTPUT_PATH" -> "/out"))
      .resolvedOutputPath.contains("/out"))
    val empty = AppConfig.fromEnv(Map.empty)
    assert(empty.resolvedOutputPath.isEmpty && empty.kinesisSource.isEmpty)
  }
}
