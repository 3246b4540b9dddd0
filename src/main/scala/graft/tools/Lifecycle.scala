package graft.tools

import java.nio.file.{Files, Paths}

/** Process-lifecycle semantics (SURVEY.md §2.8; ref
  * docker-entrypoint.sh:637-681, TestBasic.java:192-281).
  *
  *  - Stale pid cleanup: a leftover `run/graft.pid` from a SIGKILLed
  *    process is removed at boot so the engine restarts
  *    (docker-entrypoint.sh:637-640, TestBasic.java:230-266).
  *  - `EXTENSION_SCRIPT`: an init hook sourced before start; a missing
  *    file is a hard error (docker-entrypoint.sh:644,
  *    TestBasic.java:268-281).
  *  - Clean shutdown: the hook flushes databases and reports
  *    "Stopped." (TestBasic.java:192-214 waits for that log line).
  */
object Lifecycle {

  private def pidFile(dataDir: String) = Paths.get(dataDir, "run", "graft.pid")

  /** Remove a stale pid file; returns true if one was cleaned up. */
  def cleanStalePid(dataDir: String): Boolean = {
    val p = pidFile(dataDir)
    if (Files.exists(p)) { Files.delete(p); true } else false
  }

  def writePid(dataDir: String): Unit = {
    val p = pidFile(dataDir)
    Files.createDirectories(p.getParent)
    Files.writeString(p, String.valueOf(ProcessHandle.current().pid()))
  }

  /** Strict-permissions mode (SECURE_FILE_PERMISSIONS — ref
    * utilities.sh:7-10, docker-entrypoint.sh:94): the reference skips
    * chown-as-root fixups and demands mounts be readable/writable
    * up front. The engine analog: the data dir must already exist and
    * be writable — it is never auto-created or adjusted. */
  def checkDataDir(env: Map[String, String], dataDir: String): Unit =
    if (env.get("SECURE_FILE_PERMISSIONS").exists(v => v == "yes" || v == "true")) {
      val p = Paths.get(dataDir)
      if (!Files.isDirectory(p) || !Files.isWritable(p))
        throw new IllegalStateException(
          s"Folder $dataDir must be accessible and writable when " +
            "SECURE_FILE_PERMISSIONS is set; permissions will not be adjusted.")
    }

  /** EXTENSION_SCRIPT init hook: errors if the configured file is
    * missing, otherwise hands its contents to the interpreter hook. */
  def runExtensionScript(env: Map[String, String],
      interpret: String => Unit): Unit =
    env.get("EXTENSION_SCRIPT").filter(_.nonEmpty).foreach { path =>
      val p = Paths.get(path)
      if (!Files.exists(p))
        throw new IllegalStateException(
          s"EXTENSION_SCRIPT is set to $path, but no script exists there.")
      interpret(Files.readString(p))
    }

  /** Register the clean-shutdown hook: flush, remove the pid file,
    * report "Stopped.". Returns the hook (tests invoke it directly). */
  def registerShutdownHook(dataDir: String, flush: () => Unit,
      log: String => Unit = Console.out.println(_)): Thread = {
    val hook = new Thread(() => {
      flush()
      val p = pidFile(dataDir)
      if (Files.exists(p)) Files.delete(p)
      log("Stopped.")
    }, "graft-shutdown")
    Runtime.getRuntime.addShutdownHook(hook)
    hook
  }
}
