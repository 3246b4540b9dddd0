package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.tools.Lifecycle

/** Lifecycle semantics (SURVEY.md §2.8), replayed from
  * TestBasic.java:192-281 and docker-entrypoint.sh:637-644.
  */
class LifecycleSpec extends AnyFunSuite {

  private def tmp(): String = Files.createTempDirectory("graft-life").toString

  test("stale pid file from a SIGKILLed process is cleaned at boot (TestBasic.java:230-266)") {
    val dir = tmp()
    assert(!Lifecycle.cleanStalePid(dir)) // nothing to clean on first boot
    Files.createDirectories(Paths.get(dir, "run"))
    Files.writeString(Paths.get(dir, "run", "graft.pid"), "99999")
    assert(Lifecycle.cleanStalePid(dir)) // stale lock removed
    assert(!Files.exists(Paths.get(dir, "run", "graft.pid")))
    Lifecycle.writePid(dir)
    assert(Files.exists(Paths.get(dir, "run", "graft.pid")))
  }

  test("EXTENSION_SCRIPT runs when present, errors when missing (TestBasic.java:268-281)") {
    val dir = tmp()
    val script = Paths.get(dir, "ext.sh")
    Files.writeString(script, "echo hello from extension")
    var sourced: Option[String] = None
    Lifecycle.runExtensionScript(Map("EXTENSION_SCRIPT" -> script.toString),
      s => sourced = Some(s))
    assert(sourced.contains("echo hello from extension"))

    val e = intercept[IllegalStateException] {
      Lifecycle.runExtensionScript(Map("EXTENSION_SCRIPT" -> s"$dir/missing.sh"), _ => ())
    }
    assert(e.getMessage.contains("no script exists there"))
    // unset -> no-op
    Lifecycle.runExtensionScript(Map.empty, _ => fail("should not run"))
  }

  test("SECURE_FILE_PERMISSIONS refuses a missing data dir (utilities.sh:7-10)") {
    val missing = tmp() + "/nonexistent"
    val e = intercept[IllegalStateException] {
      Lifecycle.checkDataDir(Map("SECURE_FILE_PERMISSIONS" -> "yes"), missing)
    }
    assert(e.getMessage.contains("must be accessible and writable"))
    // existing writable dir passes; unset flag never checks
    Lifecycle.checkDataDir(Map("SECURE_FILE_PERMISSIONS" -> "yes"), tmp())
    Lifecycle.checkDataDir(Map.empty, missing)
  }

  test("shutdown hook flushes, removes pid, and reports Stopped. (TestBasic.java:192-214)") {
    val dir = tmp()
    Lifecycle.writePid(dir)
    var flushed = false
    var logged = List.empty[String]
    val hook = Lifecycle.registerShutdownHook(dir, () => flushed = true, l => logged ::= l)
    try {
      hook.run()
      assert(flushed)
      assert(logged.contains("Stopped."))
      assert(!Files.exists(Paths.get(dir, "run", "graft.pid")))
    } finally Runtime.getRuntime.removeShutdownHook(hook)
  }
}
