#!/usr/bin/env python
"""Generate html2text-fidelity golden fixtures.

Runs the reference's vendored html2text (CustomHTML2Text with the exact
option set pinned by markdown_generation_strategy.py:181-190) over a
curated HTML construct matrix and freezes the outputs under
tests/golden/html2text/. The goldens are BEHAVIORAL fixtures — the
engine's compat converter (functions/md_compat.py) must byte-match them;
no reference code is copied into the engine.

Run from /root/repo with the reference checkout present:
    python tools/gen_html2text_goldens.py
"""

import json
import os
import shutil
import sys
import tempfile

CASES = {
    "headings": "<h1>Main</h1><h2>Sub</h2><h3>Third</h3><p>After.</p>",
    "paragraphs": "<p>First para.</p><p>Second para with  double  spaces.</p>",
    "emphasis": "<p>Some <b>bold</b>, <strong>strong</strong>, <i>ital</i>, "
                "<em>emph</em> and <b><i>both</i></b>.</p>",
    "links": '<p>A <a href="/rel">relative</a> and '
             '<a href="http://other.test/x?q=1">absolute</a> link.</p>',
    "link_title": '<p><a href="/a" title="The Title">text</a></p>',
    "images": '<p>Before <img src="/i.png" alt="Alt text"> after.</p>',
    "image_no_alt": '<p><img src="/i.png"></p>',
    "ul": "<ul><li>one</li><li>two</li></ul>",
    "ol": "<ol><li>first</li><li>second</li></ol>",
    "nested_lists": "<ul><li>a<ul><li>a1</li><li>a2</li></ul></li>"
                    "<li>b</li></ul>",
    "ol_start": '<ol start="3"><li>three</li><li>four</li></ol>',
    "pre_code": "<pre><code>x = 1\ny = 2</code></pre>",
    "pre_plain": "<pre>raw  spaces\n  kept</pre>",
    "inline_code": "<p>Use <code>foo()</code> here.</p>",
    "blockquote": "<blockquote><p>Quoted text.</p></blockquote>",
    "nested_blockquote": "<blockquote>Outer<blockquote>Inner"
                         "</blockquote></blockquote>",
    "hr": "<p>above</p><hr><p>below</p>",
    "br": "<p>line one<br>line two</p>",
    "entities": "<p>AT&amp;T &lt;tag&gt; &nbsp;nbsp &copy; &#8212; dash</p>",
    "escaping": "<p>1986. A star * and _under_score and [bracket].</p>",
    "strike": "<p><del>gone</del> and <s>struck</s></p>",
    "headers_in_text": "<div>plain<h2>Header</h2>tail</div>",
    "div_span": "<div>block one</div><div>block <span>two</span></div>",
    "script_style": "<style>p{}</style><script>var x;</script><p>kept</p>",
    "table": "<table><tr><th>h1</th><th>h2</th></tr>"
             "<tr><td>a</td><td>b</td></tr></table>",
    "mixed_page": "<h1>Title</h1><p>Some <b>bold</b> and a "
                  '<a href="/a">link</a>.</p><ul><li>one</li>'
                  "<li>two <em>em</em></li></ul>"
                  "<pre><code>x = 1\ny = 2</code></pre>",
    "empty_elements": "<p></p><div></div><p>real</p>",
    "whitespace_collapse": "<p>\n  spread\n  over\n  lines\n</p>",
    "strong_boundaries": "<p>mid<b>word</b>bold</p>",
    "link_in_list": '<ul><li><a href="/x">x link</a> tail</li></ul>',
    "autolink": '<p><a href="http://auto.test/x">http://auto.test/x</a></p>',
    "mailto": '<p><a href="mailto:a@b.c">mail me</a></p>',
    "link_with_em": '<p><a href="/x">has <em>em</em> inside</a></p>',
    "em_link_text": '<p>word<a href="/x">link</a>word</p>',
    "bq_list": "<blockquote><ul><li>q item</li></ul></blockquote>",
    "list_blockquote": "<ul><li><blockquote>quoted</blockquote></li></ul>",
    "deep_nest": "<ul><li>a<ol><li>a1<ul><li>a1i</li></ul></li></ol></li>"
                 "</ul>",
    "charref": "<p>&#169; &#x2014; &#8230; &#120;</p>",
    "entity_in_bold": "<p><b>AT&amp;T&nbsp;x</b>tail</p>",
    "header_link": '<h2><a href="/x">linked header</a></h2>',
    "img_title_link": '<p><a href="/x">pre <img src="/i.png" alt="al"> '
                      "post</a></p>",
    "multi_br": "<p>a<br><br>b</p>",
    "div_in_div": "<div>outer<div>inner</div>tail</div>",
    "table_in_div": "<div><table><tr><td>x</td><td>y</td></tr></table>"
                    "</div>",
    "p_after_table": "<table><tr><th>h</th></tr><tr><td>v</td></tr>"
                     "</table><p>after</p>",
    "code_in_link": '<p><a href="/x">see <code>fn()</code></a></p>',
    "u_tag": "<p>an <u>underline</u> here</p>",
    "consecutive_em": "<p><em>a</em><em>b</em></p>",
    "em_punct_after": "<p><em>x</em>. Then <em>y</em>! And <em>z</em>?</p>",
    "hn_after_list": "<ul><li>x</li></ul><h2>next</h2>",
    "pre_in_list": "<ul><li>item<pre>code here</pre></li></ul>",
    "bold_em_bold": "<p><b>A<i>B</i>C</b></p>",
    "empty_page": "",
    "only_ws": "  \n  ",
    "span_styles": '<p><span style="color:red">styled</span> text</p>',
    "header_in_link": '<a href="/x"><h2>title</h2></a>',
    "header_in_link_text": '<p><a href="/x">pre<h3>head</h3></a></p>',
    "entity_in_pre": "q<pre>x &copy;<em>t</em></pre>",
    "entity_in_code_abbr": '<p><b>s</b><code>q &copy;</code>'
                           '<abbr title="T">q</abbr></p>',
    "abbr_basic": '<p>The <abbr title="World Health Organization">WHO'
                  "</abbr> says.</p>",
    "stress_across_code": "<p><b>x</b><code>c</code>tail</p>",
    "stress_across_blocks": "<p><b>x</b></p><p><code>alpha</code>tail</p>",
    "kbd_tt": "<p><kbd>Ctrl  C</kbd> and <tt>mono  sp</tt>tail</p>",
    "kbd_after_stress": "<p><b>x</b><kbd>k</kbd>tail</p>",
    "entity_after_stress": "<ul><li><b>x</b></li><li>&amp; tail</li></ul>",
}

PINNED = dict(body_width=0, ignore_emphasis=False, ignore_links=False,
              ignore_images=False, protect_links=False,
              single_line_break=True, mark_code=True, escape_snob=False)

BASEURL = "http://fix.test"


def main() -> None:
    stage = tempfile.mkdtemp(prefix="h2t_oracle_")
    shutil.copytree("/root/reference/crawl4ai/html2text",
                    os.path.join(stage, "html2text"))
    sys.path.insert(0, stage)
    from html2text import CustomHTML2Text

    outdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "golden", "html2text")
    os.makedirs(outdir, exist_ok=True)
    index = {}
    for name, html in CASES.items():
        h = CustomHTML2Text(baseurl=BASEURL)
        h.update_params(**PINNED)
        md = h.handle(html)
        with open(os.path.join(outdir, f"{name}.md"), "w") as fp:
            fp.write(md)
        index[name] = html
    with open(os.path.join(outdir, "cases.json"), "w") as fp:
        json.dump({"baseurl": BASEURL, "options": PINNED, "cases": index},
                  fp, indent=1, sort_keys=True)
    print(f"wrote {len(CASES)} goldens to {outdir}")

    # full synthetic-web pages (one per page archetype), so the pytest
    # equality check covers real engine inputs without needing the
    # reference at test time
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from crawl4ai_ray.sources.synthetic_web import SiteConfig, SyntheticWeb

    site = SyntheticWeb(SiteConfig(n_hosts=6))
    pages = {}
    for u in ["http://h0000.test/", "http://h0000.test/cat0",
              "http://h0000.test/cat0/sub0",
              "http://h0000.test/cat0/sub0/p0.html",
              "http://h0003.test/cat1/sub1/p2.html"]:
        page = site.page(u)
        h = CustomHTML2Text(baseurl=u)
        h.update_params(**PINNED)
        pages[u] = page["html"]
        safe = u.replace("://", "_").replace("/", "_").replace(".", "_")
        with open(os.path.join(outdir, f"page_{safe}.md"), "w") as fp:
            fp.write(h.handle(page["html"]))
    with open(os.path.join(outdir, "pages.json"), "w") as fp:
        json.dump(pages, fp, indent=1, sort_keys=True)
    print(f"wrote {len(pages)} page goldens")


if __name__ == "__main__":
    main()
