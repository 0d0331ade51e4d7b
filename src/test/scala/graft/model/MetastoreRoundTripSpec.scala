package graft.model

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Drives [[graft.tools.MetastoreRoundTrip]]: the pointer protocol's
  * self-healing must hold against a REAL durable catalog (hive + derby)
  * across separate JVMs — the in-memory AtomicRefreshSpec tests only
  * prove it within one process. Each phase is a fresh `java` process on
  * this test JVM's own classpath (Test/fork := true, so
  * `java.class.path` carries scalatest + spark jars + classes).
  */
class MetastoreRoundTripSpec extends AnyFunSuite {

  private def runPhase(phase: String, wh: String, derby: String): Int = {
    val java = s"${sys.props("java.home")}/bin/java"
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq(java) ++ addOpens ++ Seq(
      "-Xmx2g", "-cp", sys.props("java.class.path"),
      "graft.tools.MetastoreRoundTrip", phase, wh, derby)
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = scala.io.Source.fromInputStream(p.getInputStream).mkString
    val code = p.waitFor()
    if (code != 0) info(out.linesIterator.toSeq.takeRight(40).mkString("\n"))
    code
  }

  test("pointer self-healing round-trips a durable hive/derby metastore " +
      "across JVMs") {
    val wh = Files.createTempDirectory("graft-ms-wh").toString
    val derby = Files.createTempDirectory("graft-ms-derby").toString
    assert(runPhase("write", wh, derby) == 0, "write phase failed")
    assert(runPhase("heal", wh, derby) == 0, "heal phase failed")
  }
}
