package graft.sources

/** URL resolution + normalization for the link-graph read path (t35):
  * between t32's raw href harvest and any host-level link weighting
  * (the CCNet/RefinedWeb-class curation signal) sits the
  * normalization every crawler runs. This is the deterministic,
  * documented RFC 3986 §5 subset a replayable pipeline needs:
  *
  *  - reference forms: absolute (`scheme:`), scheme-relative (`//`),
  *    path-absolute (`/`), and path-relative, resolved against the
  *    page URL (§5.2.2's merge + §5.2.4's dot-segment removal);
  *  - normalization: scheme and host lowercase, default port
  *    stripped (80 for http, 443 for https; any other explicit port
  *    is kept), fragment removed, query kept verbatim, empty path →
  *    "/";
  *  - ONLY http/https results survive — a `mailto:`/`javascript:`/
  *    `data:` href is not a crawl edge and returns None;
  *  - no percent-decoding and no query re-ordering (both are
  *    semantics-changing on real URLs; normalizers that do them
  *    corrupt links — documented boundary).
  *
  * `None` on: non-http(s) scheme, empty/missing host, a port that is
  * not a decimal number, or an unparseable base. Never throws.
  */
object Url {

  private final case class Parts(scheme: String, host: String, port: Int,
                                 path: String, query: String)

  /** Parse an ABSOLUTE http(s) URL into parts; None otherwise. */
  private def parse(u0: String): Option[Parts] = {
    val u = stripFragment(u0)
    val c = u.indexOf("://")
    if (c <= 0) return None
    val scheme = u.substring(0, c).toLowerCase
    if (scheme != "http" && scheme != "https") return None
    afterAuthority(scheme, u.substring(c + 3))
  }

  /** Authority[/path][?query] → parts under `scheme`. */
  private def afterAuthority(scheme: String, rest: String): Option[Parts] = {
    var hostEnd = rest.length
    var i = 0
    var done = false
    while (i < rest.length && !done) {
      val ch = rest.charAt(i)
      if (ch == '/' || ch == '?' || ch == '#') { hostEnd = i; done = true }
      i += 1
    }
    val auth = rest.substring(0, hostEnd)
    val colon = auth.indexOf(':')
    val (host0, port) =
      if (colon < 0) (auth, -1)
      else {
        val p = auth.substring(colon + 1)
        if (p.isEmpty || !p.forall(c => c >= '0' && c <= '9') ||
            p.length > 5) return None
        (auth.substring(0, colon), p.toInt)
      }
    val host = host0.toLowerCase
    if (host.isEmpty) return None
    val tail = stripFragment(rest.substring(hostEnd))
    val q = tail.indexOf('?')
    val (path, query) =
      if (q < 0) (tail, "") else (tail.substring(0, q), tail.substring(q))
    Some(Parts(scheme, host, port, if (path.isEmpty) "/" else path, query))
  }

  private def stripFragment(s: String): String = {
    val h = s.indexOf('#')
    if (h < 0) s else s.substring(0, h)
  }

  /** RFC 3986 §5.2.4 remove_dot_segments. */
  private def removeDotSegments(path: String): String = {
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    var in = path
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) {
        in = "/" + in.substring(4)
        if (out.nonEmpty) out.remove(out.length - 1)
      } else if (in == "/..") {
        in = "/"
        if (out.nonEmpty) out.remove(out.length - 1)
      } else if (in == "." || in == "..") in = ""
      else {
        // move the first segment (through the NEXT '/') to the output
        val start = if (in.startsWith("/")) 1 else 0
        val slash = in.indexOf('/', start)
        val seg = if (slash < 0) in else in.substring(0, slash)
        out += seg
        in = if (slash < 0) "" else in.substring(slash)
      }
    }
    val joined = out.mkString
    if (joined.isEmpty) "/" else joined
  }

  private def render(p: Parts): String = {
    val defaultPort = if (p.scheme == "http") 80 else 443
    val portStr = if (p.port < 0 || p.port == defaultPort) "" else s":${p.port}"
    s"${p.scheme}://${p.host}$portStr${removeDotSegments(p.path)}${p.query}"
  }

  /** The host of a NORMALIZED url (for the host-graph key). */
  def hostOf(normalized: String): String = {
    val c = normalized.indexOf("://")
    val rest = normalized.substring(c + 3)
    var end = rest.length
    var i = 0
    var done = false
    while (i < rest.length && !done) {
      val ch = rest.charAt(i)
      if (ch == '/' || ch == ':' || ch == '?') { end = i; done = true }
      i += 1
    }
    rest.substring(0, end)
  }

  /** Resolve `href` against the page URL `base` and normalize; None
    * when the result is not a crawlable http(s) URL. */
  def resolve(base: String, href0: String): Option[String] = {
    val href = href0.trim
    if (href.isEmpty) return None
    // absolute form? (scheme followed by ':' before any '/', '?', '#')
    val colon = href.indexOf(':')
    val isAbsolute = colon > 0 && {
      val pre = href.substring(0, colon)
      pre.forall(c => c.isLetterOrDigit || c == '+' || c == '-' || c == '.') &&
        pre.head.isLetter
    }
    if (isAbsolute) return parse(href).map(render)
    parse(base).flatMap { b =>
      if (href.startsWith("//"))
        afterAuthority(b.scheme, href.substring(2)).map(render)
      else if (href.startsWith("/")) {
        val t = stripFragment(href)
        val q = t.indexOf('?')
        val (path, query) =
          if (q < 0) (t, "") else (t.substring(0, q), t.substring(q))
        Some(render(b.copy(path = path, query = query)))
      } else {
        // §5.2.3 merge: base path up to its last '/' + the reference;
        // §5.3: an empty-path reference keeps the BASE path (and the
        // base query too when the reference has none — `#frag` form)
        val t = stripFragment(href)
        val q = t.indexOf('?')
        val (rel, query) =
          if (q < 0) (t, "") else (t.substring(0, q), t.substring(q))
        if (rel.isEmpty)
          Some(render(b.copy(query = if (query.nonEmpty) query else b.query)))
        else {
          val baseDir = b.path.substring(0, b.path.lastIndexOf('/') + 1)
          Some(render(b.copy(path = baseDir + rel, query = query)))
        }
      }
    }
  }
}
