package graft.jobs

import graft.streaming.CurationStream

/** Test-support main for the fork-JVM lease battery (LeaseForkSpec): a
  * REAL second process — not a `tokenOverride` same-JVM simulation —
  * that acquires, heartbeats, write-fence-checks and releases a store's
  * lease under its own production `pid@host:startTime` token, driven
  * line-by-line over stdin. One status line is printed per command so
  * the parent spec can interleave its own lease operations between the
  * child's at exact points. Needs no SparkSession: the whole lease
  * protocol runs on the Hadoop FileContext seam. Never used outside
  * tests.
  */
object LeaseProbe {
  def main(args: Array[String]): Unit = {
    val storeDir = args(0)
    val out = new java.io.PrintWriter(
      new java.io.OutputStreamWriter(System.out, "UTF-8"), true)
    def firstLine(e: Throwable): String =
      Option(e.getMessage).getOrElse(e.toString).takeWhile(_ != '\n')
    def attempt(tag: String)(body: => Unit): Unit =
      try { body; out.println(s"$tag-OK") }
      catch {
        case e: IllegalStateException =>
          out.println(s"$tag-REFUSED ${firstLine(e)}")
      }
    // first act: acquire under the production token — a denial (live
    // foreign lease) is a terminal, asserted outcome for one spec leg
    try { CurationStream.acquireLease(storeDir); out.println("ACQUIRED") }
    catch {
      case e: IllegalStateException =>
        out.println(s"DENIED ${firstLine(e)}")
        sys.exit(2)
    }
    val in = new java.io.BufferedReader(
      new java.io.InputStreamReader(System.in, "UTF-8"))
    Iterator.continually(in.readLine())
      .takeWhile(l => l != null && l != "exit")
      .foreach {
        case "hb" => attempt("HB")(CurationStream.heartbeatLease(storeDir))
        case "fence" =>
          attempt("FENCE")(CurationStream.verifyWriteFence(storeDir))
        case "release" =>
          attempt("RELEASE")(CurationStream.releaseLease(storeDir))
        case other => out.println(s"UNKNOWN $other")
      }
    sys.exit(0)
  }
}
