"""HTML → main-text extraction: planted content vs planted chrome.

Pages are synthesized with KNOWN content paragraphs and KNOWN
boilerplate (nav links, footer, script, style) so the assertions state
exactly which text survives and which is dropped.
"""

from clickhouse_table_copier_spark.operators.html_extract import (
    extract_html_text,
)

_CONTENT_1 = (
    "The quick brown fox jumps over the lazy dog while the river "
    "keeps flowing toward the distant sea beyond the hills."
)
_CONTENT_2 = (
    "A second paragraph of genuine prose long enough to clear the "
    "minimum block length that the extractor enforces by default."
)

_PAGE = f"""<!DOCTYPE html>
<html><head>
  <title>Fox &amp; River</title>
  <style>body {{ color: red }}</style>
  <script>var tracking = "evil";</script>
</head><body>
  <nav><a href="/">Home</a> <a href="/about">About</a> <a href="/faq">FAQ</a></nav>
  <div id="main">
    <h1>Fox story</h1>
    <p>{_CONTENT_1}</p>
    <p>{_CONTENT_2}</p>
    <p>Read more: <a href="/a">one</a> <a href="/b">two</a> <a href="/c">three</a> <a href="/d">four</a></p>
  </div>
  <footer>Copyright 2026 Example Corp. All rights reserved worldwide.</footer>
</body></html>"""


def _df(spark, pages):
    return spark.createDataFrame(
        [(i, p) for i, p in enumerate(pages)], "doc_id long, raw_html string"
    )


def test_content_kept_chrome_dropped(spark):
    row = extract_html_text(_df(spark, [_PAGE]), "raw_html").collect()[0]
    assert _CONTENT_1 in row["text"] and _CONTENT_2 in row["text"]
    # chrome of every kind is gone
    for chrome in ("tracking", "color: red", "Home", "Copyright",
                   "Read more"):
        assert chrome not in row["text"], chrome
    assert row["title"] == "Fox & River"
    assert row["n_blocks_kept"] == 2
    assert row["n_blocks_dropped"] >= 3  # nav, footer, link farm, h1


def test_link_density_drops_link_farms(spark):
    # a long block that clears min length but is mostly links
    farm = (
        "<p>"
        + " ".join(f'<a href="/{i}">navigation link number {i}</a>' for i in range(8))
        + "</p>"
    )
    prose = f"<p>{_CONTENT_1}</p>"
    row = extract_html_text(
        _df(spark, [f"<html><body>{farm}{prose}</body></html>"]), "raw_html"
    ).collect()[0]
    assert _CONTENT_1 in row["text"]
    assert "navigation link" not in row["text"]


def test_entities_and_nesting(spark):
    page = (
        "<html><body><div><p>Tom &amp; Jerry chased each other around "
        "the big old house for hours &mdash; a fine afternoon of chaos "
        "and <b>bold</b> mischief indeed.</p></div></body></html>"
    )
    row = extract_html_text(_df(spark, [page]), "raw_html").collect()[0]
    assert "Tom & Jerry" in row["text"]
    assert "bold mischief" in row["text"]  # inline tags don't split blocks


def test_unparseable_declines(spark):
    rows = extract_html_text(
        _df(spark, [None]), "raw_html"
    ).collect()
    # NULL html → empty extraction, not a crash
    assert rows[0]["text"] == "" or rows[0]["text"] is None


def test_block_segmentation_counts(spark):
    page = (
        "<html><body>"
        + "".join(
            f"<p>Paragraph number {i} with enough characters to clear "
            f"the minimum length threshold easily.</p>"
            for i in range(5)
        )
        + "</body></html>"
    )
    row = extract_html_text(_df(spark, [page]), "raw_html").collect()[0]
    assert row["n_blocks_kept"] == 5
    assert row["text"].count("\n\n") == 4


def test_unclosed_anchor_does_not_poison_later_blocks(spark):
    """Browsers auto-close <a> at block boundaries; an unclosed tag
    must not mark the rest of the page as link text."""
    page = (
        "<html><body><p>See <a href='/x'>here</p>"
        f"<p>{_CONTENT_1}</p><p>{_CONTENT_2}</p></body></html>"
    )
    row = extract_html_text(_df(spark, [page]), "raw_html").collect()[0]
    assert _CONTENT_1 in row["text"] and _CONTENT_2 in row["text"]


def test_svg_title_is_not_the_document_title(spark):
    page = (
        "<html><head><title>Real Page</title></head><body>"
        "<svg><title>menu icon</title></svg>"
        f"<p>{_CONTENT_1}</p></body></html>"
    )
    row = extract_html_text(_df(spark, [page]), "raw_html").collect()[0]
    assert row["title"] == "Real Page"
    assert "menu icon" not in row["text"]
