package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** The durable fixture-store BUILD_LOCK liveness rules: pid probes are
  * only sound for claims provably from THIS host — everything else is
  * presumed live (reclaiming a live builder's root corrupts a
  * single-writer store mid-build; an un-reclaimed dead claim merely
  * ages out through the stale-root sweep). */
class FixtureLockSpec extends AnyFunSuite {

  /** Can this environment persist a host token at all? In a sandbox
    * where /dev/shm and java.io.tmpdir are both unwritable AND the MAC
    * set is unreadable, the sentinel IS the designed outcome — the
    * distinguishing-identity asserts only apply where an identity is
    * obtainable. */
  private def tokenPossible: Boolean =
    Seq(java.nio.file.Paths.get("/dev/shm"),
        java.nio.file.Paths.get(sys.props.getOrElse("java.io.tmpdir", "/tmp")))
      .exists(d => java.nio.file.Files.isDirectory(d) &&
        java.nio.file.Files.isWritable(d))

  test("host identity is distinguishing here, never the bare hostname") {
    val id = EtlQueries.hostId
    // the id is either the explicit presume-everything-live sentinel or
    // name + an 8-hex digest of (name, MAC set, per-host token)
    assert(id == "unknown-host" || id.matches(".*-[0-9a-f]{8}"))
    // where a machine-local token can persist (/dev/shm or tmpdir),
    // even an unreadable MAC set (the unprivileged-container case that
    // used to collapse the id to the raw hostname digest, letting two
    // 'localhost' machines pid-probe each other's claims) must yield a
    // distinguishing id, not the sentinel
    assume(tokenPossible, "no writable token dir — sentinel is correct")
    assert(id != "unknown-host")
  }

  test("own-host claims probe the pid: live holds the lock, dead is reclaimable") {
    assume(EtlQueries.hostId != "unknown-host",
      "sentinel identity — every claim is presumed live by design")
    val self = ProcessHandle.current().pid()
    assert(EtlQueries.claimantAlive(s"${EtlQueries.hostId}:$self"))
    // far above pid_max, so provably not running
    assert(!EtlQueries.claimantAlive(s"${EtlQueries.hostId}:999999999"))
  }

  test("foreign, sentinel, legacy and malformed claims are presumed live") {
    // foreign host: its pid table is not ours
    assert(EtlQueries.claimantAlive("otherhost-00000000:999999999"))
    // the sentinel name two identity-less machines could share
    assert(EtlQueries.claimantAlive("unknown-host:999999999"))
    // pre-host-format bare pid: old and new code can coexist on a
    // shared scratch, so the claim is not attributable to a host —
    // presume live even though the pid is provably dead LOCALLY
    assert(EtlQueries.claimantAlive("999999999"))
    // unparseable claims are unknowable
    assert(EtlQueries.claimantAlive("not-a-claim"))
    assert(EtlQueries.claimantAlive(s"${EtlQueries.hostId}:not-a-pid"))
  }
}
