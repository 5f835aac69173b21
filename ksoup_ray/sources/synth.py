"""Deterministic Common-Crawl-style page synthesis.

Builds the pipeline input table of `BASELINE.json.input_hint`:
``(url, warc_ts, html:binary, text, lang)`` from the driver-provided
``documents`` table — every page is a pure function of
``(doc_id, text, lang)``, so the whole corpus is reproducible and the
expected extraction output is computable in SQL (the DuckDB oracle).

Invertibility contract (what the oracle relies on):
* ``extracted_text`` == the ``text`` column byte-for-byte (body
  paragraphs re-join with single spaces under Element.text() semantics;
  boilerplate — script/style/nav — carries junk that must be stripped);
* ``title`` == ``'Doc ' || lpad(doc_id, 8, '0')``;
* ``n_links`` == ``doc_id % 4`` (links live in <nav>, stripped from text);
* ``lang`` passes through; charset varies by doc_id (deterministic)
  without changing the decoded text.

The generator is vectorized per batch (plain str ops in a tight loop —
string building, no parsing); the expensive stage is parsing, not
synthesis.
"""

from __future__ import annotations

import datetime

import pyarrow as pa

BASE_URL = "https://synth.invalid"
EPOCH = datetime.datetime(2024, 10, 24, 0, 0, 0)

# bump whenever render_page's output bytes change — cached bench
# corpora key on it so a stale /tmp cache can't mix page versions
SYNTH_VERSION = 3

# charset family rotation: deterministic by doc_id. All synth text is
# ASCII so every charset encodes it; the decode path exercises BOM +
# meta-sniff + default.
_CHARSET_FAMILY = (
    ("utf-8", "utf-8", False),        # plain default
    ("utf-8", "utf-8", False),
    ("utf-8", "utf-8", False),
    ("utf-8", "utf-8", False),
    ("iso-8859-1", "iso-8859-1", False),  # meta-declared latin-1
    ("utf-8", "utf-8", True),         # BOM-prefixed utf-8
    ("gb2312", "gb2312", False),      # meta-declared gb2312
    ("utf-16-le", "utf-16", True),    # BOM utf-16
)

_BOMS = {
    "utf-8": b"\xef\xbb\xbf",
    "utf-16-le": b"\xff\xfe",
}

_WORDS_PER_PARA = 13

# deterministic filler for the bench size mix (seeded LCG, no RNG state)
_FILLER_WORDS = (
    "lorem", "ipsum", "dolor", "sit", "amet", "consectetur", "adipiscing",
    "elit", "sed", "do", "eiusmod", "tempor", "incididunt", "labore",
    "dolore", "magna", "aliqua", "enim", "minim", "veniam", "quis",
    "nostrud", "exercitation", "ullamco", "laboris", "nisi", "aliquip",
    "commodo", "consequat", "duis", "aute", "irure",
)


def _lcg(seed: int):
    state = (seed * 6364136223846793005 + 1442695040888963407) & (2**64 - 1)
    while True:
        state = (state * 6364136223846793005 + 1442695040888963407) \
            & (2**64 - 1)
        yield state >> 33


def url_for(doc_id: int, lang: str) -> str:
    return f"{BASE_URL}/{lang}/{doc_id:08d}"


def title_for(doc_id: int) -> str:
    return f"Doc {doc_id:08d}"


def _paragraphs(words: list[str]) -> list[str]:
    return [" ".join(words[i:i + _WORDS_PER_PARA])
            for i in range(0, len(words), _WORDS_PER_PARA)] or [""]


def render_page(doc_id: int, text: str, lang: str,
                pad_bytes: int = 0) -> tuple[str, bytes, str]:
    """Render one page → (url, html_bytes, expected_extracted_text).

    ``pad_bytes`` > 0 appends deterministic filler paragraphs (bench size
    mix); the expected text grows accordingly (still exact).
    """
    words = text.split(" ") if text else []
    paras = _paragraphs(words)
    tier = doc_id % len(_CHARSET_FAMILY)
    charset, declared, use_bom = _CHARSET_FAMILY[tier]

    n_links = doc_id % 4
    nav_links = "".join(
        f'<a href="/{lang}/{(doc_id + k + 1) % 100000000:08d}">'
        f"more {k}</a> " for k in range(n_links))

    parts: list[str] = []
    parts.append("<!DOCTYPE html>\n<html><head>")
    if use_bom or tier < 4:
        pass  # BOM or default utf-8: no meta needed (but emit for realism)
    parts.append(f'<meta http-equiv="Content-Type" '
                 f'content="text/html; charset={declared}">')
    title = title_for(doc_id)
    parts.append(f"<title>{title}</title>")
    parts.append(f'<meta property="og:title" content="{title}">')
    parts.append(f'<meta name="description" content="synthetic page '
                 f'{doc_id}">')
    parts.append(f'<link rel="canonical" href="{url_for(doc_id, lang)}">')
    # full parseMetaData surface (engine/parser.py:133-182, reference
    # Ksoup.kt:192-288): every field deterministic in doc_id so the
    # extract_meta SQL oracle value-checks presence AND absence paths
    parts.append('<meta property="og:site_name" content="Synth">')
    og_type = "article" if doc_id % 3 == 0 else "website"
    parts.append(f'<meta property="og:type" content="{og_type}">')
    parts.append(f'<meta property="og:locale" content="{lang}_SY">')
    if doc_id % 9 == 2:
        parts.append(f'<meta property="og:description" '
                     f'content="og about {doc_id}">')
        parts.append(f'<meta name="twitter:description" '
                     f'content="tw about {doc_id}">')
    if doc_id % 3 == 0:
        parts.append(f'<meta property="og:image" '
                     f'content="{BASE_URL}/img/{doc_id:08d}.png">')
    parts.append(f'<meta property="og:url" '
                 f'content="{url_for(doc_id, lang)}">')
    if doc_id % 5 == 0:
        parts.append(f'<meta name="twitter:title" content="{title}">')
    if doc_id % 2 == 0:
        parts.append('<meta name="twitter:card" content="summary">')
    if doc_id % 6 == 0:
        parts.append(f'<meta name="twitter:image" '
                     f'content="{BASE_URL}/img/{doc_id:08d}t.png">')
    if doc_id % 8 == 5:
        parts.append(f'<meta name="title" content="{title}">')
    if doc_id % 4 == 1:
        parts.append(f'<meta name="author" content="Author '
                     f'{doc_id % 50}">')
    # favicon precedence: rel~=icon (regex-contains) also matches
    # "shortcut icon", so doc order decides when both exist; %2==1 and
    # %10==6 are disjoint (odd vs even) keeping the oracle a flat CASE
    if doc_id % 2 == 1:
        parts.append('<link rel="icon" href="/favicon.ico">')
    if doc_id % 10 == 6:
        parts.append(f'<link rel="shortcut icon" href='
                     f'"http://cdn.synth.invalid/ico/{doc_id:08d}.ico">')
    parts.append("<style>p{margin:0} .x{color:#000}</style>")
    parts.append("<script>var config = {\"id\": %d, \"x\": \"<b>\"};"
                 "// <!-- tricky --> </script>" % doc_id)
    parts.append("</head><body>")
    parts.append(f"<nav>{nav_links}</nav>")
    parts.append(f'<div id="content" class="doc lang-{lang}">')
    expected: list[str] = []
    for i, para in enumerate(paras):
        # entity-encode a word deterministically on some docs: decodes
        # back to the same text (tokenizer charref coverage, golden same)
        if doc_id % 7 == 3 and i == 0 and para:
            first, _, rest = para.partition(" ")
            enc = "".join(f"&#{ord(c)};" for c in first)
            para_html = enc + (" " + rest if rest else "")
        else:
            para_html = para
        cls = ' class="an-info"' if i % 5 == 0 else ""
        parts.append(f"<p{cls}>{para_html}</p>")
        expected.append(para)
    parts.append("</div>")
    if pad_bytes > 0:
        rng = _lcg(doc_id)
        pad_words: list[str] = []
        approx = 0
        while approx < pad_bytes:
            w = _FILLER_WORDS[next(rng) % len(_FILLER_WORDS)]
            pad_words.append(w)
            approx += len(w) + 1
        for i in range(0, len(pad_words), _WORDS_PER_PARA):
            chunk = " ".join(pad_words[i:i + _WORDS_PER_PARA])
            parts.append(f"<p>{chunk}</p>")
            expected.append(chunk)
    parts.append("<script>trailing();</script>")
    parts.append("</body></html>")
    html = "".join(parts)
    raw = html.encode(charset)
    if use_bom:
        raw = _BOMS[charset] + raw
    # expected text: paragraphs joined by single space (block-boundary
    # space + trim semantics of Element.text())
    expected_text = " ".join(e for e in expected if e != "") \
        if any(expected) else ""
    return url_for(doc_id, lang), raw, expected_text


def render_table_page(doc_id: int) -> str:
    """Deterministic table-bearing page for the scrape-a-table oracle:
    one ``<table>`` with caption, a ``<thead>`` header row of 3 ``th``
    cells, and ``doc_id % 3 + 1`` body rows of 3 ``td`` cells; cells
    where (row+col) is even are ``<b>``-wrapped so ``Element.text()``
    inline normalization is exercised. Query-local synth — NOT part of
    :func:`render_page`, so corpus bytes (and SYNTH_VERSION caches)
    are untouched."""
    n_rows = doc_id % 3 + 1
    head = "".join(f"<th>col{c}</th>" for c in range(3))
    body = "".join(
        "<tr>" + "".join(
            (f"<td><b>d{doc_id} r{r} c{c}</b></td>" if (r + c) % 2 == 0
             else f"<td>d{doc_id} r{r} c{c}</td>")
            for c in range(3)) + "</tr>"
        for r in range(n_rows))
    return (f'<html><body><table id="t1"><caption>Doc {doc_id}</caption>'
            f"<thead><tr>{head}</tr></thead><tbody>{body}</tbody>"
            "</table></body></html>")


def render_form_page(doc_id: int) -> str:
    """Deterministic form-bearing page for the form_data() oracle —
    every FormElement.form_data branch is hit somewhere in the corpus:
    text input with value, checkbox (checked only on even ids, value
    defaults to 'on'), hidden input, a DISABLED input (must be
    skipped), a select whose second option is selected on id%3==0
    (first-option fallback otherwise), a textarea (value = text), and
    a named submit input. Query-local synth; corpus bytes untouched."""
    checked = " checked" if doc_id % 2 == 0 else ""
    selected = " selected" if doc_id % 3 == 0 else ""
    return (
        '<html><body><form action="/submit">'
        f'<input type="text" name="q" value="q{doc_id}">'
        f'<input type="checkbox" name="opt"{checked}>'
        f'<input type="hidden" name="tok" value="t{doc_id % 97}">'
        '<input type="text" name="skip" disabled value="x">'
        '<select name="pick"><option value="a">A</option>'
        f'<option value="b"{selected}>B</option></select>'
        f'<textarea name="note">note {doc_id}</textarea>'
        '<input type="submit" name="go" value="Go">'
        "</form></body></html>")


def render_batch(batch: pa.Table, pad_mix: bool = False,
                 pad_scale: int = 1) -> pa.Table:
    """documents-table batch → CC-page batch (Arrow in / Arrow out).

    ``pad_mix=True`` applies the FIXTURES.md bench size mix:
    60% 2–20 KB, 30% 20–200 KB, 9% 200 KB–1 MB, 1% 1–2 MB.
    """
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    langs = batch.column("lang").to_pylist()
    urls: list[str] = []
    tss: list[datetime.datetime] = []
    htmls: list[bytes] = []
    out_texts: list[str] = []
    for doc_id, text, lang in zip(doc_ids, texts, langs):
        pad = 0
        if pad_mix:
            bucket = (doc_id * 2654435761) % 100
            if bucket < 60:
                pad = 2_000 + (doc_id * 97) % 18_000
            elif bucket < 90:
                pad = 20_000 + (doc_id * 997) % 180_000
            elif bucket < 99:
                pad = 200_000 + (doc_id * 9973) % 800_000
            else:
                pad = 1_000_000 + (doc_id * 99991) % 1_000_000
            pad *= pad_scale
        url, raw, expected = render_page(doc_id, text or "", lang or "en",
                                         pad_bytes=pad)
        urls.append(url)
        tss.append(EPOCH + datetime.timedelta(seconds=int(doc_id)))
        htmls.append(raw)
        out_texts.append(expected)
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(tss, pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(out_texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "doc_id": batch.column("doc_id"),
    })


def cc_pages(sf_dir: str, pad_mix: bool = False, columns=None):
    """Ray Dataset of synthesized CC pages from ``{sf_dir}/documents.parquet``.

    Streaming: read → map_batches(render) — no materialization. At 100 TB
    the real input would already BE such a table; this source stands in
    for `read_parquet` on crawl shards.
    """
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang"])
    # strip the parquet footer's pandas metadata BLOCK-WISE (no
    # concat): a schema with a metadata dict is unhashable, so every
    # downstream rebatch/concat would log a schema-dedup warning
    ds = ds.map_batches(lambda b: b.replace_schema_metadata(None),
                        batch_format="pyarrow", batch_size=None)
    return ds.map_batches(lambda b: render_batch(b, pad_mix=pad_mix),
                          batch_format="pyarrow", batch_size=256)


def render_microdata_page(doc_id: int) -> str:
    """Deterministic schema.org-microdata page (itemscope/itemprop —
    the classic jsoup structured-extraction recipe): headline + author
    on every page, a <time itemprop=datePublished datetime=...> only
    on even ids (value comes from the attribute, not the text).
    Query-local synth; corpus bytes untouched."""
    time_el = (f'<time itemprop="datePublished" '
               f'datetime="2024-10-{doc_id % 28 + 1:02d}">x</time>'
               if doc_id % 2 == 0 else "")
    return (
        '<html><body>'
        '<div itemscope itemtype="https://schema.org/Article">'
        f'<h1 itemprop="headline">Doc {doc_id:08d}</h1>'
        f'<span itemprop="author">Author {doc_id % 50}</span>'
        f"{time_el}</div></body></html>")


def render_outline_page(doc_id: int) -> str:
    """Deterministic heading/image/meta-robots page for the classic
    jsoup audit recipes (outline scrape, alt-text audit, robots
    flags). Closed-form: h1 'T<id>'; doc_id%3+1 h2 sections
    'S<id>.<j>'; an h3 'D<id>' on even ids; doc_id%4 images whose alt
    is OMITTED when (doc_id+j)%3==0; a <meta name=robots> only when
    doc_id%3<2 ('noindex,nofollow' at 0, 'index,follow' at 1).
    Query-local synth; corpus bytes untouched."""
    meta = ""
    if doc_id % 3 == 0:
        meta = '<meta name="robots" content="noindex,nofollow">'
    elif doc_id % 3 == 1:
        meta = '<meta name="robots" content="index,follow">'
    h2s = "".join(f"<h2>S{doc_id}.{j}</h2>"
                  for j in range(doc_id % 3 + 1))
    h3 = f"<h3>D{doc_id}</h3>" if doc_id % 2 == 0 else ""
    imgs = "".join(
        f'<img src="/img/{doc_id}/{j}"'
        + ("" if (doc_id + j) % 3 == 0 else f' alt="A{doc_id}.{j}"')
        + ">"
        for j in range(doc_id % 4))
    return (f"<html><head>{meta}<title>x</title></head>"
            f"<body><h1>T{doc_id}</h1>{h2s}{h3}{imgs}</body></html>")


def render_depth_page(doc_id: int) -> str:
    """Deterministic structure-stress page for DOM-shape analytics:
    a div chain nested ``doc_id % 7 + 3`` deep ending in one <span>,
    plus a <ul> of ``doc_id % 6 + 2`` items. Closed forms (html=1):
    max element depth = doc_id % 7 + 6 (the span), element count =
    6 + depth + items (html, head, title, body, divs, span, ul, lis).
    Query-local synth; corpus bytes untouched."""
    d = doc_id % 7 + 3
    n = doc_id % 6 + 2
    chain = "".join(f'<div class="l{i}">' for i in range(d)) \
        + f"<span>leaf {doc_id}</span>" + "</div>" * d
    items = "".join(f"<li>item {j}</li>" for j in range(n))
    return (f"<html><head><title>x</title></head>"
            f"<body>{chain}<ul>{items}</ul></body></html>")


def render_markdown_page(doc_id: int) -> str:
    """Deterministic structured page for the HTML→markdown stage.
    Closed forms (all alphanumeric text, so no markdown escaping):
    h1 'T<id>'; a paragraph with bold 'w<id%7>' and link 'L<id>' →
    '/l/<id>'; a ul of doc_id%3+1 items 'i<id>.<j>'; a pre block
    'raw <id>'; h2 'S<id>'; closing paragraph 'End p<id>'. Query-local
    synth; corpus bytes untouched."""
    lis = "".join(f"<li>i{doc_id}.{j}</li>"
                  for j in range(doc_id % 3 + 1))
    return (
        "<html><head><title>x</title></head><body>"
        f"<h1>T{doc_id}</h1>"
        f'<p>Intro <strong>w{doc_id % 7}</strong> and '
        f'<a href="/l/{doc_id}">L{doc_id}</a>.</p>'
        f"<ul>{lis}</ul>"
        f"<pre>raw {doc_id}</pre>"
        f"<h2>S{doc_id}</h2>"
        f"<p>End p{doc_id}</p>"
        "</body></html>")
