"""Deterministic synthetic `pages` table (FIXTURES.md §1).

Plays the role of the reference's synthetic-data generator
(/root/reference/manga_ocr_dev/synthetic_data_generator/) but *inverted*:
the reference renders text -> noisy pixels; we render text -> noisy HTML
layout, and the engine must recover the text. Seven template families
mirror the reference's robustness categories (README.md:5-12): plain
article, link-farm sidebar, multi-block interleave, ruby-annotated CJK,
presentational spans, entity/whitespace noise, malformed/hostile.

Everything is seeded (`random.Random(seed)`), wall-clock-free and
network-free, like the driver's own testdata (seed=42). Host ids follow a
power-law-ish skew so a few hosts dominate — this is what exercises the
salted repartition (SURVEY.md §4 X11).
"""

from __future__ import annotations

import datetime as dt
import random

import pandas as pd

FAMILIES = (
    "plain",
    "linkfarm",
    "multiblock",
    "ruby",
    "spans",
    "noise",
    "hostile",
)

_WORDS = (
    "spark engine content extract page block text layout web corpus stream "
    "batch window parse score merge decode table column row filter join "
    "group order data value large scale shuffle partition skew salt commit "
    "resume golden byte exact normal form reading order beam span density"
).split()

_CJK_SENT = "この文章は抽出エンジンの正確さを確かめるための十分に長い日本語の段落です。"
_RUBY = '<ruby>漢字<rt>かんじ</rt></ruby>'

_LANG_BY_HOST_MOD = {0: "en", 1: "ja", 2: "de", 3: "fr"}

_NAV = (
    '<nav><ul><li><a href="/">Home</a></li><li><a href="/about">About</a></li>'
    '<li><a href="/contact">Contact</a></li><li><a href="/terms">Terms</a></li></ul></nav>'
)
_FOOTER = '<footer><p>&copy; 2024 host corp &middot; <a href="/privacy">privacy</a> &middot; all rights reserved</p></footer>'


def _sentence(rng: random.Random, n_words: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n_words)) + "."


def _paragraphs(rng: random.Random, n: int) -> list[str]:
    return [_sentence(rng, rng.randint(12, 30)) for _ in range(n)]


def _linkfarm(rng: random.Random, n: int) -> str:
    items = "".join(
        f'<li><a href="/t/{rng.randint(0, 999)}">{rng.choice(_WORDS)} {rng.choice(_WORDS)}</a></li>'
        for _ in range(n)
    )
    return f"<aside><ul>{items}</ul></aside>"


def _page_html(rng: random.Random, family: str, paras: list[str]) -> str:
    body_parts: list[str] = [_NAV]
    if family == "plain":
        inner = "".join(f"<p>{p}</p>" for p in paras)
        body_parts.append(f"<article><h1>{_sentence(rng, 3)[:-1]}</h1>{inner}</article>")
    elif family == "linkfarm":
        inner = "".join(f"<p>{p}</p>" for p in paras)
        body_parts.append(_linkfarm(rng, rng.randint(8, 16)))
        body_parts.append(f'<div class="content">{inner}</div>')
        body_parts.append(_linkfarm(rng, rng.randint(8, 16)))
    elif family == "multiblock":
        for i, p in enumerate(paras):
            body_parts.append(f'<div class="c{i}"><p>{p}</p></div>')
            if i < len(paras) - 1:
                body_parts.append('<div class="ad"><a href="/ad">sponsored link unit</a></div>')
    elif family == "ruby":
        inner = "".join(
            f"<p>{_CJK_SENT}{_RUBY}{_CJK_SENT}</p>" for _ in range(max(1, len(paras) // 2))
        )
        body_parts.append(f"<article>{inner}</article>")
    elif family == "spans":
        decorated = [
            " ".join(
                f'<span style="text-combine-upright: all">{w}</span>' if j % 5 == 0 else w
                for j, w in enumerate(p.split())
            )
            for p in paras
        ]
        inner = "".join(f"<p>{p}</p>" for p in decorated)
        body_parts.append(f"<article>{inner}</article>")
    elif family == "noise":
        noisy = [
            p.replace(" ", "&nbsp;", 2).replace(".", "&#x2026;.", 1) + "　ＡＢＣ　ｄｅｆ"
            for p in paras
        ]
        inner = "".join(f"<p>{p}</p>" for p in noisy)
        body_parts.append(f"<article>{inner}</article>")
    elif family == "hostile":
        variant = rng.randint(0, 3)
        if variant == 0:
            return "<div<><p>broken <b>page"  # unclosed / mangled tags
        if variant == 1:
            return "<html><body></body></html>"  # empty body
        if variant == 2:
            return "<p>" + "x" * 50_000  # huge single block, unclosed
        return "\x00\x01<zz>�<p>tiny</p>"  # control bytes + junk
    body_parts.append(_FOOTER)
    return "<html><head><title>fixture</title></head><body>" + "".join(body_parts) + "</body></html>"


def generate_pages(n_rows: int, seed: int = 42, n_hosts: int = 20) -> pd.DataFrame:
    """Build the deterministic pages table (url, warc_ts, html, text, lang)."""
    rng = random.Random(seed)
    base_ts = dt.datetime(2024, 3, 1)
    rows = []
    for i in range(n_rows):
        family = FAMILIES[i % len(FAMILIES)]
        # Zipf-ish host skew: cubing pushes mass toward host 0 (SURVEY §4 X11)
        host = int(n_hosts * (rng.random() ** 3))
        url = f"https://host{host:03d}.example/{family}/{i:06d}"
        warc_ts = base_ts + dt.timedelta(minutes=(i * 37) % (30 * 24 * 60))
        paras = _paragraphs(rng, rng.randint(2, 5))
        html = _page_html(rng, family, paras)
        # WET-style flattened full-page text: nav + content + footer —
        # deliberately NOT the answer (FIXTURES.md §1)
        wet = " ".join(["Home About Contact Terms", *paras, "© 2024 host corp privacy"])
        lang = "ja" if family == "ruby" else _LANG_BY_HOST_MOD[host % 4]
        rows.append(
            {
                "url": url,
                "warc_ts": warc_ts,
                "html": html.encode("utf-8") if family != "hostile" or rng.random() > 0.5
                else html.encode("utf-8", errors="replace") + b"\xff\xfe",
                "text": wet,
                "lang": lang,
                "family": family,  # dropped before the engine sees the table
            }
        )
    return pd.DataFrame(rows)
