"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §F1).

Produces the exact ``BASELINE.json.input_hint`` schema
``(url string, warc_ts timestamp, html binary, text string, lang string)``
with seeded quirks that exercise every integrity check:

* a configurable % of rows duplicated verbatim     → DataDuplicates / TrainTestSamplesMix
* lang variant spellings ("EN", "en ", "e-n")      → StringMismatch
* lang string-nulls ("null", "N/A", "", "nan")     → MixedNulls
* Zipf-skewed hosts                                → salting / skew handling
* ``text`` = extract_text(html) byte-for-byte      → the extractor invariant

Every row is a pure function of (seed, row_index): the same generator
runs on the driver for unit fixtures and fanned out over executors via
Arrow-batched mapInPandas for bench-scale corpora, producing identical
rows either way. No external data.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta, timezone

import numpy as np
import pandas as pd

from deepchecks_spark.corpus.extractor import extract_text

LANGS = ["en", "de", "fr", "es", "zh", "pt", "it", "nl", "pl", "ru"]
_LANG_WEIGHTS = np.array([0.42, 0.12, 0.10, 0.09, 0.08, 0.06, 0.05, 0.04, 0.02, 0.02])

_LANG_VARIANTS = {"en": ["EN", "en ", "e-n"], "de": ["DE", "De"], "fr": ["FR."]}
_STRING_NULLS = ["null", "N/A", "", "nan", "NULL"]

# Small deterministic per-language word pools (seeded synthetic prose).
_WORDS = {
    "en": "the of and to in a is that web page data quick brown fox crawl index search open free news".split(),
    "de": "der die das und ist nicht ein seite netz daten schnell braun fuchs suche frei neu".split(),
    "fr": "le la les et est pas une page toile donnees vite brun renard cherche libre nouveau".split(),
    "es": "el la los y es no una pagina red datos rapido zorro busca libre nuevo".split(),
    "zh": "的 一 是 在 不 了 有 和 人 这 网 页 数 据 搜 索".split(),
    "pt": "o a os e nao uma pagina rede dados rapido raposa busca livre novo".split(),
    "it": "il la i e non una pagina rete dati veloce volpe cerca libero nuovo".split(),
    "nl": "de het een en is niet pagina web gegevens snel vos zoek vrij nieuw".split(),
    "pl": "i w nie to strona siec dane szybki lis szukaj wolny nowy".split(),
    "ru": "и в не на я что страница сеть данные быстрый лиса поиск новый".split(),
}

_BASE_TS = datetime(2025, 1, 1, tzinfo=timezone.utc)

CORPUS_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"


def _render_html(rng: np.random.Generator, lang: str, doc_idx: int) -> str:
    words = _WORDS[lang]
    pick = lambda n: " ".join(rng.choice(words, size=n))  # noqa: E731
    title = pick(int(rng.integers(2, 7)))
    n_paras = int(rng.integers(1, 6))
    paras = []
    for _ in range(n_paras):
        body = pick(int(rng.integers(8, 60)))
        if rng.random() < 0.3:
            body += f' <a href="/l/{int(rng.integers(0, 9999))}">{pick(2)}</a> {pick(3)}'
        if rng.random() < 0.15:  # entity + unicode to exercise the parser
            body += " &amp; café &lt;tag&gt; — "
        paras.append(f"<p>{body}</p>")
    script = "<script>var x=%d;</script>" % doc_idx if rng.random() < 0.4 else ""
    style = "<style>p{color:red}</style>" if rng.random() < 0.2 else ""
    return (
        f"<html><head><title>{title}</title>{style}</head>"
        f"<body>{script}<h1>{title}</h1>{''.join(paras)}"
        f"<footer>doc {doc_idx}</footer></body></html>"
    )


def _row(src: int, seed: int, string_null_fraction: float,
         variant_fraction: float, n_hosts: int):
    """One webpage row, a pure function of (seed, src). Duplicated rows
    share src → identical in every column (exact verbatim duplicates)."""
    rng = np.random.Generator(np.random.PCG64(np.random.SeedSequence([seed, 1, src])))
    lang = LANGS[int(rng.choice(len(LANGS), p=_LANG_WEIGHTS))]
    html = _render_html(rng, lang, src)
    host = int(np.floor(rng.zipf(1.4))) % n_hosts  # Zipf-skewed hosts
    slug = hashlib.sha1(f"{seed}:{src}".encode()).hexdigest()[:16]
    url = f"https://site{host}.example/{slug}"
    qrng = np.random.Generator(np.random.PCG64(np.random.SeedSequence([seed, 2, src])))
    lang_out = lang
    q = qrng.random()
    if q < string_null_fraction:
        lang_out = _STRING_NULLS[int(qrng.integers(0, len(_STRING_NULLS)))]
    elif q < string_null_fraction + variant_fraction and lang in _LANG_VARIANTS:
        variants = _LANG_VARIANTS[lang]
        lang_out = variants[int(qrng.integers(0, len(variants)))]
    ts = (_BASE_TS + timedelta(seconds=src * 37)).replace(tzinfo=None)
    return (url, ts, html.encode("utf-8"), extract_text(html), lang_out)


def rows_for_indices(indices, n_rows: int, seed: int = 42, dup_fraction: float = 0.05,
                     variant_fraction: float = 0.02, string_null_fraction: float = 0.02,
                     n_hosts: int = 97) -> pd.DataFrame:
    """Rows for an arbitrary index subset — the single implementation
    behind both the driver-side and the distributed generator."""
    n_unique = max(1, int(n_rows * (1.0 - dup_fraction)))
    out = []
    for i in (int(x) for x in indices):
        src = i if i < n_unique else (i * 2654435761) % n_unique
        out.append(_row(src, seed, string_null_fraction, variant_fraction, n_hosts))
    return pd.DataFrame(out, columns=["url", "warc_ts", "html", "text", "lang"])


def generate_corpus_pandas(n_rows: int, seed: int = 42, **kw) -> pd.DataFrame:
    """Full corpus as a pandas frame (unit-test scale)."""
    return rows_for_indices(range(n_rows), n_rows, seed=seed, **kw)


def generate_corpus_spark(spark, n_rows: int, seed: int = 42,
                          partitions: int | None = None, **kw):
    """Corpus as a Spark DataFrame, generated driver-side (test scale)."""
    pdf = generate_corpus_pandas(n_rows, seed=seed, **kw)
    df = spark.createDataFrame(pdf, schema=CORPUS_DDL)
    if partitions:
        df = df.repartition(partitions)
    return df


def generate_corpus_distributed(spark, n_rows: int, seed: int = 42,
                                partitions: int = 32, **kw):
    """Cluster-scale path: each partition generates its own index range
    via Arrow-batched mapInPandas — no driver materialization, no
    shuffle; scales to arbitrary row counts because rows are a pure
    function of (seed, index)."""
    base = spark.range(0, n_rows, 1, partitions)
    genkw = dict(kw)

    def _gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield rows_for_indices(pdf["id"].to_numpy(), n_rows, seed=seed, **genkw)

    return base.mapInPandas(_gen, schema=CORPUS_DDL)
