"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md F1).

Schema = BASELINE.json input_hint: (url, warc_ts, html, text, lang).
Seed 42 everywhere; no external data. ~100 domains Zipf-skewed so one domain
holds ~20% of rows (exercises the salted per-domain rollup). Document mix:
 (a) clean prose            (kept by the filter)
 (b) short / low word count (drop: too_short)
 (c) high-repetition        (drop: repetition_*)
 (d) symbol-heavy           (drop: symbol_ratio / non_alpha)
 (e) boilerplate            (drop: boilerplate)
 (f) PII-embedded prose     (kept, scrubbed — valid IBAN/Luhn/SSN checksums
     so the validator-gated scrubber fires; patterns.rs:43-401 vectors)
 (g) empty text + html body (exercises the extraction path)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from dataprof_ray import schema as S

SEED = 42

_WORDS_EN = (
    "the data stream reads every record and computes exact statistics over the "
    "full table while memory stays bounded and results remain stable the engine "
    "filters documents by quality rules and writes surviving pages back to "
    "partitioned storage for later training runs with clear lineage and checks"
).split()

_WORDS_DE = (
    "der die das und in den von zu mit sich auf für ist nicht ein als auch es an "
    "werden daten strom liest jeden satz und berechnet genaue werte über die volle "
    "tabelle während der speicher begrenzt bleibt und ergebnisse stabil bleiben"
).split()

_WORDS_FR = (
    "le la les de des et en un une du dans est que pour qui sur pas au plus par il "
    "flux de données lit chaque enregistrement et calcule des statistiques exactes "
    "sur la table entière pendant que la mémoire reste bornée et les résultats stables"
).split()

_LANG_WORDS = {"en": _WORDS_EN, "de": _WORDS_DE, "fr": _WORDS_FR}

_BOILER_TEXTS = (
    "We use cookies to improve your experience. Accept all cookies to continue. "
    "Privacy policy terms of service all rights reserved. Subscribe to our newsletter "
    "for updates. Skip to content navigation menu home about contact us legal notices.",
)


def _luhn_complete(prefix15: str) -> str:
    digits = [int(c) for c in prefix15]
    total = 0
    for i, d in enumerate(digits):
        # position relative to final 16-digit number: double every second from right
        if (15 - i) % 2 == 1:
            doubled = d * 2
            total += doubled - 9 if doubled > 9 else doubled
        else:
            total += d
    return prefix15 + str((10 - total % 10) % 10)


def _iban_complete(country: str, bban: str) -> str:
    rearranged = bban + country + "00"
    numeric = "".join(str(ord(c) - ord("A") + 10) if c.isalpha() else c for c in rearranged)
    check = 98 - int(numeric) % 97
    return f"{country}{check:02d}{bban}"


def _pii_tokens(rng: np.random.Generator) -> list[str]:
    email = f"user{rng.integers(1, 999)}@example{rng.integers(1, 99)}.com"
    phone = f"+1 {rng.integers(200, 999)}-{rng.integers(100, 999)}-{rng.integers(1000, 9999)}"
    uuid_hex = "".join(rng.choice(list("0123456789abcdef"), 32))
    uuid = f"{uuid_hex[:8]}-{uuid_hex[8:12]}-{uuid_hex[12:16]}-{uuid_hex[16:20]}-{uuid_hex[20:]}"
    ipv4 = f"{rng.integers(1, 254)}.{rng.integers(0, 254)}.{rng.integers(0, 254)}.{rng.integers(1, 254)}"
    iban = _iban_complete("DE", f"{rng.integers(10**17, 10**18 - 1)}")
    card = _luhn_complete("".join(str(d) for d in rng.integers(0, 10, 15)))
    area = int(rng.integers(1, 665))
    ssn = f"{area:03d}-{rng.integers(1, 99):02d}-{rng.integers(1, 9999):04d}"
    return [email, phone, uuid, ipv4, iban, card, ssn]


def _prose(rng: np.random.Generator, lang: str, n_words: int) -> str:
    words = _LANG_WORDS.get(lang, _WORDS_EN)
    picks = rng.integers(0, len(words), n_words)
    out = []
    line = []
    for i, w in enumerate(picks):
        line.append(words[w])
        if (i + 1) % 13 == 0:
            out.append(" ".join(line))
            line = []
    if line:
        out.append(" ".join(line))
    return "\n".join(out)


def generate_corpus(n_rows: int, seed: int = SEED, n_domains: int = 100) -> pa.Table:
    """Build the deterministic corpus table (all columns, F1 schema)."""
    rng = np.random.default_rng(seed)

    # Zipf-skewed domain assignment: domain 0 holds ~20% of rows.
    ranks = np.arange(1, n_domains + 1, dtype=np.float64)
    probs = 1.0 / ranks ** 1.3
    probs /= probs.sum()
    domains = rng.choice(n_domains, size=n_rows, p=probs)

    categories = rng.choice(
        ["clean", "short", "repetition", "symbols", "boiler", "pii", "html"],
        size=n_rows,
        p=[0.40, 0.12, 0.10, 0.08, 0.08, 0.12, 0.10],
    )
    langs = rng.choice(["en", "de", "fr", "it", ""], size=n_rows, p=[0.6, 0.15, 0.15, 0.05, 0.05])

    urls, texts, htmls = [], [], []
    base_ts = np.datetime64("2025-06-01T00:00:00", "ms")
    ts = base_ts + rng.integers(0, 30 * 24 * 3600 * 1000, n_rows).astype("timedelta64[ms]")

    for i in range(n_rows):
        cat = categories[i]
        lang = langs[i] or "en"
        url = f"https://site{domains[i]}.example.com/page/{i}"
        urls.append(url)
        html_doc = b""
        if cat == "clean":
            text = _prose(rng, lang, int(rng.integers(60, 300)))
        elif cat == "short":
            text = _prose(rng, lang, int(rng.integers(1, 25)))
        elif cat == "repetition":
            line = _prose(rng, lang, 8).replace("\n", " ")
            text = "\n".join([line] * int(rng.integers(10, 30)))
        elif cat == "symbols":
            body = _prose(rng, lang, 80)
            junk = "".join(rng.choice(list("#$%&@{}[]<>|~^"), 120))
            text = body + " " + " ".join(junk[j:j + 3] for j in range(0, 120, 3))
        elif cat == "boiler":
            text = _BOILER_TEXTS[0] + "\n" + _prose(rng, lang, 60)
        elif cat == "pii":
            body = _prose(rng, "en", int(rng.integers(60, 200)))
            tokens = _pii_tokens(rng)
            words = body.split(" ")
            for tok in tokens[: int(rng.integers(2, 6))]:
                pos = int(rng.integers(0, len(words)))
                words.insert(pos, tok)
            text = " ".join(words)
        else:  # html: empty text, body in html column
            body = _prose(rng, lang, int(rng.integers(60, 200)))
            paras = "".join(f"<p>{ln}</p>" for ln in body.split("\n"))
            html_doc = (
                "<html><head><title>t</title><script>var x=1;</script>"
                f"<style>p{{margin:0}}</style></head><body><div>{paras}</div>"
                "</body></html>"
            ).encode()
            text = ""
        texts.append(text)
        htmls.append(html_doc)

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("ms")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array([l if l else None for l in langs], pa.string()),
        }
    ).cast(S.CORPUS_SCHEMA)


def write_corpus_parquet(path: str, n_rows: int, seed: int = SEED, shards: int = 8) -> str:
    """Write the corpus as `shards` parquet files under `path` (one directory,
    resumable-friendly layout)."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    per = (n_rows + shards - 1) // shards
    table = generate_corpus(n_rows, seed)
    for s in range(shards):
        chunk = table.slice(s * per, per)
        if chunk.num_rows == 0:
            break
        pq.write_table(chunk, os.path.join(path, f"shard_{s:05d}.parquet"))
    return path
