"""Deterministic HTML fixture corpus for the main-content extraction
operator (html_main.py), with HAND-DERIVED expected spans.

Every family is a full page assembled from a boilerplate template (nav,
header, sidebar, footer, ads — all designed to FAIL the density rules or
match the boilerplate vocabulary) around family-specific main content
designed to PASS them.  `EXPECTED[family]` lists the (kind, text,
media_ref) spans in document order — written from the SPEC of each family,
so the golden oracle (tools/gen_golden_html_main.py) is independent of the
parser/classifier under test.
"""

from __future__ import annotations

# Long sentences (>= 25 normalized chars) that must be KEPT
P1 = "The quick brown fox jumps over the lazy dog near the river bank."
P2 = "Distributed systems trade consistency for availability under partitions."
P3 = "Winnowing selects a canonical fingerprint from every window of hashes."
P4 = "Déjà vu: les naïfs ægithales hâtifs pondant à Noël où il gèle."
CAP = "Figure one shows the annotated pipeline overview in detail."
H1 = "Understanding Content Extraction"
H2 = "Density Heuristics"

_BOILERPLATE_TOP = (
    "<html><head><title>t</title><script>var x=1;</script>"
    "<style>.a{color:red}</style></head><body>"
    "<nav><a href='/'>Home</a> <a href='/a'>News</a> <a href='/b'>Sports</a></nav>"
    "<header><a href='/login'>Log in</a> <a href='/join'>Join now</a></header>"
    "<div class='sidebar'><p>" + P1 + "</p></div>"
    "<div id='ad-banner'><p>" + P2 + "</p></div>"
)
_BOILERPLATE_BOTTOM = (
    "<div class='related'><ul><li><a href='/x'>" + P3 + "</a></li></ul></div>"
    "<footer><p>Copyright 2026 Example Corp. All rights reserved forever.</p>"
    "</footer></body></html>"
)
# NOTE: the footer paragraph is long enough to pass density but sits in a
# hard-dropped <footer>; the sidebar/ad/related texts are long but dropped
# by the class/id vocabulary — each family asserts boilerplate stripping.


def _page(main: str) -> str:
    return _BOILERPLATE_TOP + main + _BOILERPLATE_BOTTOM


def fx_basic_article():
    html = _page(
        "<article><h1>" + H1 + "</h1><p>" + P1 + "</p><p>" + P2 + "</p>"
        "<p>" + P3 + "</p></article>"
    )
    return html, [
        ("heading", H1, ""), ("text", P1, ""), ("text", P2, ""), ("text", P3, ""),
    ]


def fx_inline_image():
    html = _page(
        "<article><p>" + P1 + "</p>"
        "<figure><img src='fig1.png' alt='pipeline diagram'>"
        "<figcaption>" + CAP + "</figcaption></figure>"
        "<p>" + P2 + "</p></article>"
    )
    return html, [
        ("text", P1, ""),
        ("media", "pipeline diagram", "fig1.png"),
        ("text", CAP, ""),
        ("text", P2, ""),
    ]


def fx_nav_heavy():
    links = "".join(
        f"<li><a href='/s{i}'>Section number {i} page</a></li>" for i in range(12)
    )
    html = _page("<div><ul>" + links + "</ul><p>" + P2 + "</p></div>")
    return html, [("text", P2, "")]


def fx_comments_dropped():
    html = _page(
        "<article><p>" + P1 + "</p></article>"
        "<div class='comments'><p>" + P2 + "</p><p>" + P3 + "</p></div>"
    )
    return html, [("text", P1, "")]


def fx_nested_divs():
    html = _page(
        "<div><div><div><p>" + P3 + "</p></div></div>"
        "<div><section><p>" + P2 + "</p></section></div></div>"
    )
    return html, [("text", P3, ""), ("text", P2, "")]


def fx_table_layout():
    html = _page(
        "<table><tr><td><a href='/m'>Menu one</a> <a href='/n'>Menu two</a></td>"
        "<td>" + P1 + "</td></tr></table>"
    )
    return html, [("text", P1, "")]


def fx_unicode_text():
    html = _page("<main><h2>" + H2 + "</h2><p>" + P4 + "</p></main>")
    return html, [("heading", H2, ""), ("text", P4, "")]


def fx_malformed_unclosed():
    # unclosed <p>: the second opens inside the first (tolerant tree);
    # each scores on its DIRECT text so both paragraphs survive
    html = _page("<div><p>" + P1 + "<p>" + P2 + "</p></div>")
    return html, [("text", P1, ""), ("text", P2, "")]


def fx_all_boilerplate():
    html = _page("")
    return html, []


def fx_link_density_edge():
    # first paragraph: > 1/3 of its chars inside the link -> dropped;
    # second: one short link inside long text -> kept with link text inline
    linky = "Read <a href='/more'>much much more right here on this page</a> now."
    kept = P2.replace("availability", "<a href='/cap'>availability</a>")
    kept_text = P2
    html = _page("<div><p>" + linky + "</p><p>" + kept + "</p></div>")
    return html, [("text", kept_text, "")]


def fx_media_rich():
    html = _page(
        "<article><p>" + P1 + "</p>"
        "<figure><video src='clip.mp4'></video></figure>"
        "<figure><audio src='talk.wav'></audio>"
        "<figcaption>" + CAP + "</figcaption></figure></article>"
    )
    return html, [
        ("text", P1, ""),
        ("media", "", "clip.mp4"),
        ("media", "", "talk.wav"),
        ("text", CAP, ""),
    ]


def fx_whitespace_collapse():
    messy = "The   quick\n\n brown\t fox   jumps over the lazy dog tonight."
    clean = "The quick brown fox jumps over the lazy dog tonight."
    html = _page("<article><p>" + messy + "</p></article>")
    return html, [("text", clean, "")]


FAMILIES = {
    "basic_article": fx_basic_article,
    "inline_image": fx_inline_image,
    "nav_heavy": fx_nav_heavy,
    "comments_dropped": fx_comments_dropped,
    "nested_divs": fx_nested_divs,
    "table_layout": fx_table_layout,
    "unicode_text": fx_unicode_text,
    "malformed_unclosed": fx_malformed_unclosed,
    "all_boilerplate": fx_all_boilerplate,
    "link_density_edge": fx_link_density_edge,
    "media_rich": fx_media_rich,
    "whitespace_collapse": fx_whitespace_collapse,
}


def make_large_page(n_paras: int, seed: int = 0) -> str:
    """Deterministic big page: n_paras keepable paragraphs (cycling the P*
    sentences with a per-para uniqueness token) inside the full boilerplate
    template, plus one figure every 8 paragraphs — the scale-bench shape."""
    sents = [P1, P2, P3]
    parts = ["<article>"]
    for i in range(n_paras):
        parts.append(f"<p>{sents[(seed + i) % 3]} Paragraph marker {seed}-{i}.</p>")
        if i % 8 == 7:
            parts.append(
                f"<figure><img src='img{seed}-{i}.png' alt='figure {i}'>"
                f"<figcaption>{CAP}</figcaption></figure>"
            )
    parts.append("</article>")
    return _page("".join(parts))


def html_corpus(replicas: int = 1) -> list[tuple[str, str, list]]:
    """(doc_id, html, expected_spans) — replicated deterministically."""
    out = []
    for rep in range(replicas):
        for name, fn in sorted(FAMILIES.items()):
            html, expected = fn()
            out.append((f"{name}-{rep:06d}", html, expected))
    return out


def expected_span_rows(replicas: int = 1) -> list[tuple[str, int, str, str, str, int]]:
    """Hand-derived expected (doc_id, pos, kind, text, media_ref, offset)
    rows with the running-offset rule applied — the golden oracle source."""
    rows = []
    for doc_id, _html, expected in html_corpus(replicas):
        offset = 0
        for pos, (kind, text, ref) in enumerate(expected):
            rows.append((doc_id, pos, kind, text, ref, offset))
            offset += len(text) + 1
    return rows
