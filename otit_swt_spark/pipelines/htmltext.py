"""HTML -> main-text extraction: the stage real pretraining pipelines run
FIRST — raw crawl pages become clean text before any dedup / quality /
chunking stage sees them. Pure stdlib (``html.parser``) with
trafilatura-style text-density heuristics (Kohlschütter et al. 2010
boilerplate detection, public knowledge): strip non-content subtrees
outright, split the rest into block-level text runs, then keep blocks
whose LINK DENSITY is low — navigation/footer boilerplate is short and
link-saturated, body prose is long and link-sparse.

Reference parity: the reference engine has no HTML stage (its inputs are
already-structured stores, SURVEY §2.1); this module is part of the
additive LLM-data-pipeline surface, composed as the optional first stage
of :func:`otit_swt_spark.pipelines.corpus.prepare_corpus_full`.

Scale shape: one Arrow-batched ``mapInPandas`` pass — per-row stateless
parsing, no shuffle, linear in corpus bytes, exactly the profile a
100 TB crawl wants (the parse is the bottleneck, so it must live in the
map stage next to the scan)."""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

# Subtrees that never contain main text — dropped wholesale.
_DROP = {"script", "style", "noscript", "template", "svg", "head",
         "nav", "footer", "header", "aside", "form", "button", "iframe"}
# Elements that terminate the current text block.
_BLOCK = {"p", "div", "li", "ul", "ol", "table", "tr", "td", "th",
          "article", "section", "main", "br", "h1", "h2", "h3", "h4",
          "h5", "h6", "blockquote", "pre", "figure", "figcaption",
          "body", "html"}
_HEADING = {"h1", "h2", "h3", "h4", "h5", "h6"}


class _TextBlocks(HTMLParser):
    """Collect (text, link_chars, is_heading) block tuples plus the page
    title; tolerant of unclosed tags (stack depth counters, not a strict
    tree). ``convert_charrefs=True`` (the default) unescapes entities."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int, bool]] = []
        self.title = ""
        self._drop_depth = 0
        self._in_title = False
        self._link_depth = 0
        self._heading_depth = 0
        self._buf: list[str] = []
        self._link_chars = 0

    def _flush(self) -> None:
        text = " ".join("".join(self._buf).split())
        if text:
            self.blocks.append((text, self._link_chars,
                                self._heading_depth > 0))
        self._buf = []
        self._link_chars = 0

    def handle_starttag(self, tag, attrs):
        if tag == "body":
            # browsers implicitly close an unclosed <head> (or any other
            # stray open drop-subtree) when <body> starts; without this a
            # missing </head> would swallow the whole document
            self._drop_depth = 0
        if tag in _DROP:
            self._drop_depth += 1
            return
        if self._drop_depth:
            return
        if tag in _BLOCK:
            self._flush()
            if tag in _HEADING:
                self._heading_depth += 1
        elif tag == "a":
            self._link_depth += 1

    def handle_startendtag(self, tag, attrs):
        if not self._drop_depth and tag in _BLOCK:
            self._flush()

    def handle_endtag(self, tag):
        if tag in _DROP:
            if self._drop_depth:
                self._drop_depth -= 1
            return
        if tag == "title":
            self._in_title = False
            return
        if self._drop_depth:
            return
        if tag in _BLOCK:
            self._flush()
            if tag in _HEADING and self._heading_depth:
                self._heading_depth -= 1
        elif tag == "a" and self._link_depth:
            self._link_depth -= 1

    def handle_data(self, data):
        if self._in_title:
            self.title += data
            return
        if self._drop_depth:
            return
        self._buf.append(data)
        if self._link_depth:
            self._link_chars += len(data)

class _TitleAwareBlocks(_TextBlocks):
    """<title> lives inside <head>, which is otherwise dropped — route
    its text to the title field before the drop check sees it. An
    UNCLOSED <title> must not swallow the document: html.parser does
    not treat title as RCDATA (no close tag is ever synthesized), so
    any subsequent start tag also ends title mode. Only the FIRST
    <title> that is either inside <head> or outside every dropped
    subtree is captured — <title> elements inside other drop contexts
    (<svg><title>icon</title></svg> accessibility labels, common inline
    icon markup) are NOT the page title."""

    def __init__(self) -> None:
        super().__init__()
        self._head_depth = 0
        self._title_done = False

    def handle_starttag(self, tag, attrs):
        if tag == "head":
            self._head_depth += 1
        elif tag == "body":
            self._head_depth = 0  # mirror the implicit-</head> rule
        if tag == "title":
            if not self._title_done and (
                    self._head_depth > 0 or self._drop_depth == 0):
                self._in_title = True
                self._title_done = True
            return
        self._in_title = False
        super().handle_starttag(tag, attrs)

    def handle_endtag(self, tag):
        if tag == "head" and self._head_depth:
            self._head_depth -= 1
        super().handle_endtag(tag)


def extract_main_text(html: str, min_block_chars: int = 25,
                      max_link_density: float = 0.5) -> tuple[str, str]:
    """Parse ONE page: returns ``(title, text)`` where ``text`` joins the
    retained blocks with blank lines. A block survives if it is a
    heading, or it is long enough AND link-sparse:
    ``len >= min_block_chars and link_chars/len <= max_link_density`` —
    the two-feature version of the text-density boilerplate rule (long,
    link-poor blocks are prose; short or link-rich blocks are chrome)."""
    p = _TitleAwareBlocks()
    try:
        p.feed(html or "")
        p.close()
    except Exception:
        pass  # salvage whatever was collected from malformed input
    p._flush()
    kept = []
    for text, link_chars, heading in p.blocks:
        if heading:
            kept.append(text)
        elif (len(text) >= min_block_chars
                and link_chars / len(text) <= max_link_density):
            kept.append(text)
    return " ".join(p.title.split()), "\n\n".join(kept)


def html_extract(df: DataFrame, html_col: str = "html",
                 id_col: str = "doc_id", min_block_chars: int = 25,
                 max_link_density: float = 0.5,
                 keep_cols: tuple[str, ...] = ()) -> DataFrame:
    """Distributed main-text extraction: one ``mapInPandas`` pass turning
    ``(id, html)`` into ``(id, title, text, n_chars)``. Stateless per
    row — no shuffle, linear scan, Arrow-batched; the id column is
    passed through (its input type preserved) so the result joins back
    to any sibling metadata without re-keying. ``keep_cols`` rider
    columns ride the same pass untouched (types preserved) — the
    streaming crawl chain needs the fetch URL downstream and a
    stream-stream re-join would demand watermark state for what is a
    purely map-side pass-through."""
    id_type = df.schema[id_col].dataType.simpleString()
    keep = [c for c in keep_cols if c not in (id_col, html_col)]
    clash = sorted({"title", "text", "n_chars"} & set(keep))
    if clash:
        raise ValueError(
            f"keep_cols collide with html_extract output columns: {clash}")
    keep_schema = "".join(
        f", {c} {df.schema[c].dataType.simpleString()}" for c in keep)
    schema = (f"{id_col} {id_type}, title string, text string,"
              f" n_chars long{keep_schema}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            titles, texts = [], []
            for h in pdf[html_col]:
                t, x = extract_main_text(h, min_block_chars,
                                         max_link_density)
                titles.append(t)
                texts.append(x)
            out = pd.DataFrame({
                id_col: pdf[id_col],
                "title": titles,
                "text": texts,
                "n_chars": [len(x) for x in texts],
            })
            for c in keep:
                out[c] = pdf[c]
            yield out

    return df.select(id_col, html_col, *keep).mapInPandas(run, schema)


class _LinkCollector(_TitleAwareBlocks):
    """Also collect (href, anchor_text) for <a> tags OUTSIDE dropped
    subtrees — nav/footer/script links are chrome, not citations, and
    never reach the outlink graph."""

    def __init__(self) -> None:
        super().__init__()
        self.links: list[tuple[str, str]] = []
        self._href: str | None = None
        self._anchor: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag == "a" and not self._drop_depth:
            self._href = dict(attrs).get("href") or ""
            self._anchor = []
        super().handle_starttag(tag, attrs)

    def handle_endtag(self, tag):
        if tag == "a" and not self._drop_depth and self._href is not None:
            self.links.append(
                (self._href, " ".join("".join(self._anchor).split())))
            self._href = None
        super().handle_endtag(tag)

    def handle_data(self, data):
        if self._href is not None and not self._drop_depth:
            self._anchor.append(data)
        super().handle_data(data)


def extract_links(html: str) -> list[tuple[str, str]]:
    """Parse ONE page into its content-area outlinks:
    ``[(href, anchor_text), ...]`` in document order, excluding links
    inside dropped subtrees (nav/footer/header/aside/script/...)."""
    p = _LinkCollector()
    try:
        p.feed(html or "")
        p.close()
    except Exception:
        pass
    return p.links


def html_links(df: DataFrame, html_col: str = "html",
               id_col: str = "doc_id") -> DataFrame:
    """Distributed outlink extraction: ``(id, html)`` -> one row per
    content-area link ``(id_col, href, anchor)`` — the crawl-graph edge
    list that feeds :mod:`urltools` canonicalization and the graph
    operators (domain-level PageRank, dedup of syndicated sources).
    Same mapInPandas shape as :func:`html_extract`: stateless per row,
    no shuffle, linear in corpus bytes; the id column's input type is
    preserved."""
    id_type = df.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, href string, anchor string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hrefs, anchors = [], [], []
            for rid, h in zip(pdf[id_col], pdf[html_col]):
                for href, anchor in extract_links(h):
                    ids.append(rid)
                    hrefs.append(href)
                    anchors.append(anchor)
            yield pd.DataFrame({id_col: pd.Series(ids, dtype=object),
                                "href": pd.array(hrefs, dtype="string"),
                                "anchor": pd.array(anchors,
                                                   dtype="string")})

    return df.select(id_col, html_col).mapInPandas(run, schema)
