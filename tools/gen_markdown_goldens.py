#!/usr/bin/env python3
"""Capture markdown goldens from the reference converter.

Drives the reference's vendored html2text (CustomHTML2Text) with the exact
options DefaultMarkdownGenerator uses (markdown_generation_strategy.py:181-190)
and writes {name, html, base, md} records to
src/test/resources/markdown_goldens.json — the behavioral pin for
graft.scrape.Html2Md (MarkdownSpec compares on every case).

Also accepts an optional JSON file of synthetic pages (url -> html, produced
by `sbt "runMain graft.FixtureGen pages <out>"`) whose conversions are
appended as cases named by URL.

Run driver-side only (the reference package is never on the library
classpath):  python3 tools/gen_markdown_goldens.py [pages.json]
"""
import json
import shutil
import sys
import tempfile
import os

# the reference repo's crawl4ai/types.py shadows the stdlib `types` module if
# crawl4ai/ itself lands on sys.path — copy the self-contained html2text
# package into a clean workspace instead
ws = tempfile.mkdtemp(prefix="h2tws")
shutil.copytree("/root/reference/crawl4ai/html2text", os.path.join(ws, "html2text"))
sys.path.insert(0, ws)
from html2text import CustomHTML2Text  # noqa: E402

OPTS = {
    "body_width": 0,
    "ignore_emphasis": False,
    "ignore_links": False,
    "ignore_images": False,
    "protect_links": False,
    "single_line_break": True,
    "mark_code": True,
    "escape_snob": False,
}


def md(html, base=""):
    h = CustomHTML2Text(baseurl=base)
    h.update_params(**OPTS)
    return h.handle(html).replace("    ```", "```")


CASES = [
    ("heading", "<h1>Title One</h1><p>Para text.</p><h2>Sub</h2><p>More.</p>", ""),
    ("heading_levels", "<h3>Three</h3><h4>Four</h4><h5>Five</h5><h6>Six</h6>", ""),
    ("lists", "<ul><li>alpha</li><li>beta <b>bold</b></li></ul><ol><li>one</li><li>two</li></ol>", ""),
    ("nested_list", "<ul><li>a<ul><li>a1</li><li>a2</li></ul></li><li>b</li></ul>", ""),
    ("ol_ul", "<ol><li>x<ul><li>y</li></ul></li></ol>", ""),
    ("ol_many", "<ol>" + "".join(f"<li>item {i}</li>" for i in range(12)) + "</ol>", ""),
    ("emphasis", "<p>some <em>it</em> and <strong>bo</strong> and <code>cd</code> and <del>dl</del></p>", ""),
    ("emphasis_tight", "<p>foo<em>bar</em>baz</p>", ""),
    ("emphasis_nested", "<p><strong><em>both</em></strong> after</p>", ""),
    ("pre", "<p>before</p><pre>line1\nline2  indent</pre><p>after</p>", ""),
    ("pre_code", "<pre><code>def f():\n    pass\n</code></pre>", ""),
    ("inline_code_ws", "<p>use <code>a  b\nc</code> here</p>", ""),
    ("links", '<p>go <a href="/rel/page">here</a> or <a href="http://x.com/abs">there</a> now</p>', ""),
    ("link_title", '<p><a href="http://x.com/a" title="T">txt</a></p>', ""),
    ("auto_link", '<p><a href="http://x.com/a">http://x.com/a</a></p>', ""),
    ("link_bold_inside", '<p><a href="http://x.com/a"><b>bold link</b></a></p>', ""),
    ("link_mailto", '<p><a href="mailto:a@b.c">mail</a> x</p>', ""),
    ("img", '<p><img src="/img/a.png" alt="Alt text"/> tail</p>', ""),
    ("img_noalt", '<p><img src="/img/b.png"/> tail</p>', ""),
    ("img_link", '<p><a href="http://x.com/p"><img src="http://x.com/i.png" alt="A"/></a></p>', ""),
    ("table", "<table><tr><th>H1</th><th>H2</th></tr><tr><td>a</td><td>b</td></tr><tr><td>c</td><td>d</td></tr></table>", ""),
    ("table_caption", "<table><caption>Cap</caption><tr><th>N</th><th>P</th></tr><tr><td>x</td><td>1</td></tr></table>", ""),
    ("blockquote", "<p>x</p><blockquote>quoted text <em>em</em></blockquote><p>y</p>", ""),
    ("blockquote_multi", "<blockquote><p>one</p><p>two</p></blockquote>", ""),
    ("br_hr", "<p>a<br>b</p><hr><p>c</p>", ""),
    ("title_head", "<html><head><title>T</title><style>p{}</style></head><body><p>body text</p></body></html>", ""),
    ("script_skip", "<p>a</p><script>var x = '<b>no</b>';</script><p>b</p>", ""),
    ("special_chars", "<p>a*b _c_ d [e] f&amp;g &lt;h&gt; i\\j</p>", ""),
    ("repeat_link", '<p><a href="http://x.com/a">one</a> <a href="http://x.com/a">two</a> <a href="http://x.com/b">three</a></p>', ""),
    ("empty", "", ""),
    ("spaces", "<p>  lots   of\n whitespace  </p><div>div text</div>", ""),
    ("rel_base", '<p><a href="/r/p">rel</a> <img src="i.png" alt="m"/></p>', "http://site0.com/cat0/"),
    ("hidden_div", '<div style="display:none">SECRET</div><p>shown</p>', ""),
    ("nav_crumbs", '<nav class="x"><a href="/">Home</a> » <a href="/cat0">Category 0</a> » Now</nav><p>t</p>', ""),
    ("video_audio", '<video controls width="640"><source src="/m/v.mp4" type="video/mp4"></video><audio src="/m/a.ogg"></audio><p>t</p>', ""),
    ("dl", "<dl><dt>Term</dt><dd>Def</dd><dt>T2</dt><dd>D2</dd></dl>", ""),
    ("u_and_q", "<p><u>under</u> and <q>quoted</q></p>", ""),
]

records = [{"name": n, "html": h, "base": b, "md": md(h, b)} for n, h, b in CASES]

if len(sys.argv) > 1:
    pages = json.load(open(sys.argv[1]))  # [{name, url, html}] — url#prods=N keys
    for rec in sorted(pages, key=lambda r: r["name"]):
        records.append({"name": rec["name"], "html": rec["html"],
                        "base": rec["url"], "md": md(rec["html"], rec["url"])})

out = os.path.join(os.path.dirname(__file__), "..", "src", "main", "resources",
                   "markdown_goldens.json")
os.makedirs(os.path.dirname(out), exist_ok=True)
with open(out, "w") as f:
    json.dump(records, f, indent=1)
print(f"wrote {len(records)} goldens to {out}")
