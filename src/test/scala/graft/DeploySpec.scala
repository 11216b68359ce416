package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

/** Drift guard for the UNTESTABLE deployment twin (deploy/docker-compose.yml
  * — no container runtime exists offline): the file cannot be executed here,
  * but it CAN be held structurally consistent with the code it deploys.
  * Every check below is a way the runbook has historically rotted in
  * projects like this: an env var the app no longer reads, a renamed main
  * class, a producer/app disagreement on the shared volume path, a
  * healthcheck probing a marker nobody writes.
  */
class DeploySpec extends AnyFunSuite {

  private def read(p: String): String =
    new String(Files.readAllBytes(Paths.get(p)), StandardCharsets.UTF_8)

  private lazy val compose = read("deploy/docker-compose.yml")

  /** Env keys the streaming mains actually read (derived from source, so a
    * rename on either side fails here, not in a user's terminal).
    */
  private lazy val codeEnvKeys: Set[String] = {
    val srcs = Seq("AppConfig", "AppMain", "ProducerMain", "Readiness")
      .map(n => s"src/main/scala/graft/streaming/$n.scala")
      .filter(p => Files.exists(Paths.get(p))).map(read).mkString("\n")
    // Anchor to actual READ SITES (env.get("K") / env.getOrElse("K", …) /
    // sys.env.get…("K") / getenv("K")), not bare uppercase string literals —
    // the literal form also matched log levels, SQL fragments and "UTC",
    // letting the compose check pass vacuously on a coincidental name.
    ("(?:\\benv|sys\\.env)\\.(?:get|getOrElse|contains|apply)\\(\\s*\"([A-Z][A-Z0-9_]{2,})\"" +
      "|getenv\\(\\s*\"([A-Z][A-Z0-9_]{2,})\"").r
      .findAllMatchIn(srcs)
      .map(m => Option(m.group(1)).getOrElse(m.group(2))).toSet
  }

  /** KEY=value env entries in the compose file; `commented = true` also
    * includes the documented Kinesis-variant block.
    */
  private def composeEnvKeys(commented: Boolean): Seq[(String, String)] = {
    val re = if (commented) "(?m)^\\s*#?\\s*-\\s*([A-Z][A-Z0-9_]+)=(.*)$".r
    else "(?m)^\\s*-\\s*([A-Z][A-Z0-9_]+)=(.*)$".r
    re.findAllMatchIn(compose).map(m => m.group(1) -> m.group(2).trim).toSeq
  }

  test("every env var the compose file sets (incl. the commented Kinesis block) is one the mains read") {
    // consumed by the upstream images themselves, not by our mains
    val imageOwned = Set(
      "SPARK_NO_DAEMONIZE", // apache/spark's spark-class launcher
      "SERVICES")           // localstack's service selector
    val unknown = composeEnvKeys(commented = true).map(_._1).toSet --
      codeEnvKeys -- imageOwned
    assert(unknown.isEmpty,
      s"compose sets env vars no main reads (renamed or dropped in code?): $unknown")
  }

  test("submitted main classes exist under the names the compose file uses") {
    val classes = "--class\\s+(\\S+)".r.findAllMatchIn(compose)
      .map(_.group(1)).toSeq
    assert(classes.toSet == Set("graft.streaming.ProducerMain",
      "graft.streaming.AppMain"), s"unexpected submit classes: $classes")
    classes.foreach { c =>
      val obj = c.split("\\.").last
      val src = s"src/main/scala/graft/streaming/$obj.scala"
      assert(Files.exists(Paths.get(src)) && read(src).contains(s"object $obj"),
        s"compose submits $c but $src does not define it")
    }
  }

  test("startup gating matches the reference: app waits on a HEALTHY producer, producer healthcheck probes the marker ProducerMain writes") {
    assert(compose.contains("condition: service_healthy"),
      "app must gate on producer health, not mere startup")
    val marker = composeEnvKeys(commented = false)
      .collectFirst { case ("READY_MARKER", v) => v }
    assert(marker.nonEmpty, "producer must configure READY_MARKER")
    assert(compose.contains(s""""test", "-f", "${marker.get}""""),
      s"producer healthcheck must test the READY_MARKER path ${marker.get}")
  }

  test("producer and app agree on the shared envelope directory, and it lives on the shared volume") {
    val dirs = composeEnvKeys(commented = false)
      .collect { case ("ENVELOPE_DIR", v) => v }.distinct
    assert(dirs.size == 1,
      s"producer and app must point at ONE envelope dir, got: $dirs")
    assert(dirs.head.startsWith("/data/"),
      s"envelope dir must live on the shared data volume: ${dirs.head}")
    assert(compose.contains("data:/data"), "services must mount the data volume")
  }

  test("only public images are referenced, pinned to the Spark/Scala line the build targets") {
    val images = "(?m)^\\s*image:\\s*(\\S+)".r.findAllMatchIn(compose)
      .map(_.group(1)).toSet
    images.foreach(i => assert(
      i.startsWith("apache/spark:") || i.startsWith("localstack/localstack:"),
      s"non-public or unexpected image: $i"))
    assert(images.exists(i => i.contains("scala2.13") && i.contains("java17")),
      s"Spark images must match the build's scala 2.13 / java 17: $images")
  }

  test("compose file passes a `docker compose config`-level structural validation (YAML schema + reference closure)") {
    // No container runtime exists offline, but the file must at least be
    // what `docker compose config` would accept: well-formed YAML, known
    // top-level sections, and a CLOSED reference graph (depends_on targets
    // and volume names that resolve). These are exactly the failure modes
    // a hand-edited runbook file develops silently.
    import scala.jdk.CollectionConverters._
    val root = new org.yaml.snakeyaml.Yaml()
      .load[java.util.Map[String, Object]](compose).asScala
    assert(root.keySet.subsetOf(Set("services", "volumes", "networks")),
      s"unknown top-level compose sections: ${root.keySet}")
    val services = root("services").asInstanceOf[java.util.Map[String, Object]]
      .asScala.map { case (k, v) =>
        k -> v.asInstanceOf[java.util.Map[String, Object]].asScala
      }.toMap
    assert(services.nonEmpty, "compose must define services")
    val volumeNames = root.get("volumes")
      .map(_.asInstanceOf[java.util.Map[String, Object]].asScala.keySet.toSet)
      .getOrElse(Set.empty[String])
    services.foreach { case (name, svc) =>
      assert(svc.contains("image"), s"service $name has no image")
      // depends_on closure: list form or map form, every target defined
      svc.get("depends_on").foreach { d =>
        val targets = d match {
          case l: java.util.List[_] => l.asScala.map(_.toString)
          case m: java.util.Map[_, _] =>
            m.asScala.map(_._1.toString).toSeq
          case other => fail(s"$name: unparseable depends_on $other")
        }
        targets.foreach(t => assert(services.contains(t),
          s"service $name depends_on undefined service $t"))
      }
      // named-volume closure: "name:/path" mounts must resolve; ./ paths
      // are bind mounts and exempt
      svc.get("volumes").foreach { v =>
        v.asInstanceOf[java.util.List[_]].asScala.map(_.toString).foreach { m =>
          val src = m.split(":").head
          if (!src.startsWith(".") && !src.startsWith("/"))
            assert(volumeNames.contains(src),
              s"service $name mounts undefined named volume $src")
        }
      }
      // healthcheck test must be the exec-array form (list of strings)
      svc.get("healthcheck").foreach { h =>
        val t = h.asInstanceOf[java.util.Map[String, Object]].asScala("test")
        assert(t.isInstanceOf[java.util.List[_]] &&
          t.asInstanceOf[java.util.List[_]].asScala.forall(_.isInstanceOf[String]),
          s"service $name healthcheck.test must be an exec array: $t")
      }
    }
  }

  test("README run instructions reference real paths and the jar name the compose mounts") {
    val readme = read("deploy/README.md")
    val jar = "(/jars/\\S+\\.jar)".r.findFirstMatchIn(compose).map(_.group(1))
    assert(jar.contains("/jars/graft.jar"), s"compose jar path drifted: $jar")
    assert(readme.contains("deploy/jars") && readme.contains("graft.jar"),
      "README must describe placing the built jar where the compose mounts it")
  }
}
