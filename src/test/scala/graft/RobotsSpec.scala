package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.politeness.Robots

/** Golden cases mirroring urllib.robotparser semantics (the matcher the
  * reference delegates to, utils.py:313-365) — first matching rule in file
  * order wins; missing/empty rules fail open; substring agent match.
  */
class RobotsSpec extends AnyFunSuite {

  val simple = "User-agent: *\nDisallow: /private\nAllow: /public"

  test("basic disallow prefix") {
    assert(!Robots.canFetch(simple, "http://x.com/private/page.html"))
    assert(!Robots.canFetch(simple, "http://x.com/private"))
    assert(Robots.canFetch(simple, "http://x.com/public/page.html"))
    assert(Robots.canFetch(simple, "http://x.com/other"))
    assert(Robots.canFetch(simple, "http://x.com/"))
  }

  test("allow before disallow wins (file order)") {
    val r = "User-agent: *\nAllow: /private/ok\nDisallow: /private"
    assert(Robots.canFetch(r, "http://x.com/private/ok/page"))
    assert(!Robots.canFetch(r, "http://x.com/private/no"))
  }

  test("disallow-all and allow-all") {
    assert(!Robots.canFetch("User-agent: *\nDisallow: /", "http://x.com/any"))
    // empty Disallow value = allow everything
    assert(Robots.canFetch("User-agent: *\nDisallow:", "http://x.com/any"))
  }

  test("fail-open on missing/blank rules") {
    assert(Robots.canFetch(null, "http://x.com/a"))
    assert(Robots.canFetch("", "http://x.com/a"))
    assert(Robots.canFetch("   \n  ", "http://x.com/a"))
  }

  test("agent group selection: substring match, specific beats *") {
    val r = "User-agent: googlebot\nDisallow: /nogoogle\n\nUser-agent: *\nDisallow: /noall"
    assert(!Robots.canFetch(r, "http://x.com/nogoogle/x", "Googlebot/2.1"))
    assert(Robots.canFetch(r, "http://x.com/noall/x", "Googlebot/2.1"))
    assert(!Robots.canFetch(r, "http://x.com/noall/x", "otherbot"))
    assert(Robots.canFetch(r, "http://x.com/nogoogle/x", "otherbot"))
  }

  test("comments and crawl-delay ignored; query string matched") {
    val r = "# a comment\nUser-agent: *\nCrawl-delay: 5\nDisallow: /s?q= # inline"
    assert(!Robots.canFetch(r, "http://x.com/s?q=term"))
    assert(Robots.canFetch(r, "http://x.com/s"))
  }

  test("percent-encoding normalized both sides") {
    val r = "User-agent: *\nDisallow: /caf%C3%A9"
    assert(!Robots.canFetch(r, "http://x.com/café/menu"))
  }

  test("multiple user-agent lines share a group") {
    val r = "User-agent: a\nUser-agent: b\nDisallow: /x"
    assert(!Robots.canFetch(r, "http://x.com/x", "a"))
    assert(!Robots.canFetch(r, "http://x.com/x", "b"))
    assert(Robots.canFetch(r, "http://x.com/x", "c"))
  }
}
