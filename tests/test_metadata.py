"""MetadataTest tranche — translated from reference
ksoup-test/.../meta/MetadataTest.kt (Ksoup.parseMetaData)."""

from ksoup_ray.engine import parser as KP
from ksoup_ray.engine.parser import parse_metadata

HTML = """\
<html>
    <head>
        <title>Test Page</title>
        <meta property="og:title" content="Test OG Title">
        <meta property="og:description" content="Test OG Description">
        <meta property="og:image" content="https://example.com/image.png">
        <meta property="og:url" content="https://example.com">
        <meta name="twitter:title" content="Test Twitter Title">
        <meta name="twitter:description" content="Test Twitter Description">
        <meta name="twitter:image" content="https://example.com/twitter_image.png">
        <meta name="description" content="Test Description">
        <link rel="canonical" href="https://example.com">
        <link rel="icon" href="/favicon.ico">
        <link href="/pikacon-32x32.png" rel="shortcut icon" type="image/png">
    </head>
</html>
"""


def _assert_meta(md):
    assert md["html_title"] == "Test Page"
    assert md["og_title"] == "Test OG Title"
    assert md["og_description"] == "Test OG Description"
    assert md["og_image"] == "https://example.com/image.png"
    assert md["og_url"] == "https://example.com"
    assert md["twitter_title"] == "Test Twitter Title"
    assert md["twitter_description"] == "Test Twitter Description"
    assert md["twitter_image"] == "https://example.com/twitter_image.png"
    assert md["description"] == "Test Description"
    assert md["canonical"] == "https://example.com"
    assert md["favicon"] == "https://example.com/favicon.ico"
    assert md["shortcut_icon"] == "https://example.com/pikacon-32x32.png"


def test_parse_metadata_from_element():
    doc = KP.parse(HTML, "https://example.com")
    _assert_meta(parse_metadata(doc))


def test_parse_metadata_absent_fields_none():
    doc = KP.parse("<html><head><title>T</title></head></html>")
    md = parse_metadata(doc)
    assert md["html_title"] == "T"
    assert md["og_title"] is None
    assert md["favicon"] is None
    assert md["shortcut_icon"] is None


def test_parse_metadata_absolute_favicon_not_rebased():
    doc = KP.parse(
        '<head><link rel="icon" href="HTTP://cdn.example.com/i.ico"></head>',
        "https://example.com")
    md = parse_metadata(doc)
    # startsWith("http", ignoreCase) — absolute URLs are left alone
    assert md["favicon"] == "HTTP://cdn.example.com/i.ico"


def test_parse_metadata_no_base_uri_keeps_relative():
    doc = KP.parse('<head><link rel="icon" href="/favicon.ico"></head>')
    md = parse_metadata(doc)
    assert md["favicon"] == "/favicon.ico"


def test_parse_metadata_reader_page():
    # the larger real-world head from the reference file (shortcut icon
    # picks the FIRST matching link)
    html = """
    <html><head>
    <meta name="msapplication-TileImage" content="https://animepahe.ru/animepahe-270x270.png">
    <title>animepahe :: okay-ish anime website</title>
    <meta name="description" content="Watch or download anime shows in HD 720p/1080p.">
    <meta property="og:site_name" content="animepahe">
    <meta property="og:locale" content="en_US">
    <meta property="og:image" content="https://animepahe.ru/animepahe-270x270.png">
    <meta property="og:url" content="https://animepahe.ru">
    <meta property="og:type" content="website">
    <meta property="og:title" content="cloud anime encoding">
    <meta name="author" content="animepahe">
    <link href="/apple-touch-icon.png" rel="apple-touch-icon-precomposed" type="image/png">
    <link href="/apple-touch-icon.png" rel="shortcut icon">
    <link href="/pikacon-32x32.png" rel="shortcut icon" type="image/png">
    <link href="/pikacon.ico" rel="shortcut icon" type="image/x-icon">
    </head></html>
    """
    doc = KP.parse(html, "https://animepahe.ru/")
    md = parse_metadata(doc)
    assert md["html_title"] == "animepahe :: okay-ish anime website"
    assert md["og_title"] == "cloud anime encoding"
    assert md["og_image"] == "https://animepahe.ru/animepahe-270x270.png"
    assert md["og_site_name"] == "animepahe"
    assert md["og_locale"] == "en_US"
    assert md["og_type"] == "website"
    assert md["author"] == "animepahe"
    assert md["shortcut_icon"] == "https://animepahe.ru//apple-touch-icon.png"


def test_extract_document_full_meta_struct():
    """The flagship stage surfaces the COMPLETE parseMetaData struct
    (all 18 fields), not a subset — on a synth page carrying the
    og/twitter image/url/card fields and the favicon links."""
    from ksoup_ray.sources.synth import render_page, url_for
    from ksoup_ray.stages.extract import META_STRUCT, extract_document

    # doc_id 6: %3==0 (og_image, article), %2==0 (twitter_card),
    # %6==0 (twitter_image), %10==6 (shortcut icon; favicon = it)
    url, raw, _ = render_page(6, "alpha beta gamma", "en")
    rec = extract_document(raw, url)
    meta = rec["meta"]
    assert set(meta) == {f.name for f in META_STRUCT}
    assert meta["og_image"] == "https://synth.invalid/img/00000006.png"
    assert meta["twitter_image"] == \
        "https://synth.invalid/img/00000006t.png"
    assert meta["twitter_card"] == "summary"
    assert meta["og_type"] == "article"
    assert meta["og_url"] == url_for(6, "en")
    assert meta["shortcut_icon"] == \
        "http://cdn.synth.invalid/ico/00000006.ico"
    # no rel=icon link on even ids -> the shortcut link IS the favicon
    # (rel~=icon regex-contains semantics)
    assert meta["favicon"] == meta["shortcut_icon"]
    assert meta["twitter_title"] is None and meta["author"] is None

    # doc_id 13: %2==1 (rel=icon -> base-prefixed favicon),
    # %8==5 (meta name=title), %4==1 (author), %5!=0, %3!=0
    url13, raw13, _ = render_page(13, "alpha", "en")
    m13 = extract_document(raw13, url13)["meta"]
    assert m13["favicon"] == url13 + "/favicon.ico"
    assert m13["shortcut_icon"] is None
    assert m13["title"] == "Doc 00000013"
    assert m13["author"] == "Author 13"
    assert m13["og_image"] is None and m13["og_type"] == "website"
