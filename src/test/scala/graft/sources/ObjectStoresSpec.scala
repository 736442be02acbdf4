package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Object-store URI resolution + env-credential injection (reference:
  * columnq/src/io/mod.rs:63-75 scheme grammar, columnq.rs:209-273 env-built
  * stores). No network: asserts on the produced URI and Hadoop conf. */
class ObjectStoresSpec extends AnyFunSuite {

  test("s3:// rewrites to the s3a connector, path preserved") {
    assert(ObjectStores.toHadoopUri("s3://bucket/a/b.parquet", Map.empty) ===
      "s3a://bucket/a/b.parquet")
  }

  test("gs/adl/abfs pass through; non-object-store URIs untouched") {
    assert(ObjectStores.toHadoopUri("gs://bucket/t", Map.empty) === "gs://bucket/t")
    assert(ObjectStores.toHadoopUri("abfss://c@acc.dfs.core.windows.net/p", Map.empty) ===
      "abfss://c@acc.dfs.core.windows.net/p")
    assert(ObjectStores.toHadoopUri("/local/path.csv", Map.empty) === "/local/path.csv")
    assert(ObjectStores.toHadoopUri("https://host/x.json", Map.empty) === "https://host/x.json")
  }

  test("az:// forms the abfss authority from AZURE_STORAGE_ACCOUNT_NAME") {
    val env = Map("AZURE_STORAGE_ACCOUNT_NAME" -> "myacct")
    assert(ObjectStores.toHadoopUri("az://mycontainer/dir/f.parquet", env) ===
      "abfss://mycontainer@myacct.dfs.core.windows.net/dir/f.parquet")
    assert(ObjectStores.toHadoopUri("azure://c2", env) ===
      "abfss://c2@myacct.dfs.core.windows.net")
    val e = intercept[IllegalArgumentException] {
      ObjectStores.toHadoopUri("az://c/p", Map.empty)
    }
    assert(e.getMessage.contains("AZURE_STORAGE_ACCOUNT_NAME"))
  }

  test("AWS env maps to fs.s3a conf incl. minio-style endpoint/http") {
    val conf = ObjectStores.hadoopConf(Map(
      "AWS_ACCESS_KEY_ID" -> "AKID", "AWS_SECRET_ACCESS_KEY" -> "SK",
      "AWS_SESSION_TOKEN" -> "TOK", "AWS_REGION" -> "us-west-2",
      "AWS_ENDPOINT" -> "http://127.0.0.1:9000", "AWS_ALLOW_HTTP" -> "true"))
    assert(conf("fs.s3a.access.key") === "AKID")
    assert(conf("fs.s3a.secret.key") === "SK")
    assert(conf("fs.s3a.session.token") === "TOK")
    assert(conf("fs.s3a.aws.credentials.provider")
      .contains("TemporaryAWSCredentialsProvider"))
    assert(conf("fs.s3a.endpoint.region") === "us-west-2")
    assert(conf("fs.s3a.endpoint") === "http://127.0.0.1:9000")
    assert(conf("fs.s3a.path.style.access") === "true")
    assert(conf("fs.s3a.connection.ssl.enabled") === "false")
  }

  test("GCS + Azure env map to their connector keys") {
    val conf = ObjectStores.hadoopConf(Map(
      "GOOGLE_SERVICE_ACCOUNT" -> "/tmp/sa.json",
      "AZURE_STORAGE_ACCOUNT_NAME" -> "acct",
      "AZURE_STORAGE_ACCOUNT_KEY" -> "k3y"))
    assert(conf("google.cloud.auth.service.account.enable") === "true")
    assert(conf("google.cloud.auth.service.account.json.keyfile") === "/tmp/sa.json")
    assert(conf("fs.azure.account.key.acct.dfs.core.windows.net") === "k3y")
  }

  test("empty env produces no conf; unset keys only are filled") {
    assert(ObjectStores.hadoopConf(Map.empty) === Map.empty)
  }
}

/** End-to-end: an s3:// table source reaches Spark AS an s3a:// read with the
  * session's Hadoop conf carrying the env credentials — proving the code is
  * drop-in once hadoop-aws is on the classpath. */
class ObjectStoresSessionSpec extends SparkSpec {

  test("registering an s3:// table resolves to s3a and injects credentials") {
    val env = Map("AWS_ACCESS_KEY_ID" -> "AKID-e2e", "AWS_SECRET_ACCESS_KEY" -> "SK-e2e")
    val src = TableSource("s3t", "s3://some-bucket/path/t.parquet", Some("parquet"))
    val resolved = ObjectStores.resolve(spark, src, env)
    assert(resolved.uri === "s3a://some-bucket/path/t.parquet")
    assert(spark.sparkContext.hadoopConfiguration.get("fs.s3a.access.key") === "AKID-e2e")
    // user-set keys are not clobbered on re-resolve
    spark.sparkContext.hadoopConfiguration.set("fs.s3a.access.key", "explicit")
    ObjectStores.resolve(spark, src, env)
    assert(spark.sparkContext.hadoopConfiguration.get("fs.s3a.access.key") === "explicit")
    // the load path itself fails only at the missing connector, i.e. AFTER
    // the rewrite: the error names s3a, not s3
    val err = intercept[Throwable] { Loaders.load(spark, src).collect() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(err).exists(m => m.contains("s3a") || m.contains("S3A")),
      s"expected an s3a-scheme failure, got: ${messages(err).mkString(" | ")}")
  }
}
