package graft

/** Throwaway-scratch allocation for harness-built tables, streaming
  * checkpoints and finite-replay sinks. Prefers RAM-backed /dev/shm over
  * java.io.tmpdir: scenario builds and micro-batch commits issue many
  * small synchronous writes, and on a disk-backed /tmp those — not
  * compute — dominate under box write-back pressure. Production supplies
  * real storage URIs via config; scratch here is always throwaway.
  */
object Scratch {
  def dir(prefix: String): java.nio.file.Path = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    if (java.nio.file.Files.isWritable(shm))
      java.nio.file.Files.createTempDirectory(shm, prefix)
    else java.nio.file.Files.createTempDirectory(prefix)
  }
}
