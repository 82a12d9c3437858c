"""Trained char-trigram Naive Bayes language ID (operators/langid.py,
round 12 — r11 verdict #5): accuracy vs the marker-word baseline on
real multilingual text (the fixtures' lang labels are uncorrelated
with their synthetic text, so the registry family pins determinism and
THESE tests pin usefulness), model/scoring contracts, and the integer
determinism seam."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from petk_spark.operators.langid import (
    LANGID_SCALE,
    _grams,
    _ilog,
    langid_predict_frame,
    train_char_langid,
)

# Small real-text corpora (public common phrases, written for this
# test). es vs pt is the verdict's named failure case: they share most
# function words, so marker-word hit counting cannot separate them.
TRAIN = {
    "en": [
        "the quick brown fox jumps over the lazy dog near the river bank",
        "she said that it was going to rain for the rest of the week",
        "we should meet in the morning and walk to the market together",
        "this is the kind of thing that makes people happy with life",
        "thank you for the help with the heavy boxes in the garage",
    ],
    "es": [
        "el perro corre por el parque y salta sobre la valla del vecino",
        "gracias por la ayuda con las cajas pesadas en el garaje ayer",
        "vamos a la playa por la manana y despues comemos en casa",
        "esta lloviendo mucho y no podemos salir a caminar hoy dia",
        "la comida estaba muy rica y el postre fue lo mejor de todo",
    ],
    "pt": [
        "o cachorro corre pelo parque e pula sobre a cerca do vizinho",
        "obrigado pela ajuda com as caixas pesadas na garagem ontem",
        "vamos a praia de manha e depois comemos em casa com a familia",
        "esta chovendo muito e nao podemos sair para caminhar hoje",
        "a comida estava muito gostosa e a sobremesa foi o melhor de tudo",
    ],
    "de": [
        "der hund lauft durch den park und springt uber den zaun des nachbarn",
        "danke fur die hilfe mit den schweren kisten in der garage gestern",
        "wir gehen morgen an den strand und essen danach zu hause",
        "es regnet sehr stark und wir konnen heute nicht spazieren gehen",
        "das essen war sehr lecker und der nachtisch war das beste",
    ],
    "fr": [
        "le chien court dans le parc et saute par dessus la cloture du voisin",
        "merci pour l aide avec les boites lourdes dans le garage hier",
        "nous allons a la plage demain matin et ensuite nous mangeons",
        "il pleut beaucoup et nous ne pouvons pas nous promener aujourd hui",
        "le repas etait tres bon et le dessert etait le meilleur de tout",
    ],
}
# Held-out short phrases — no training sentence repeated; several have
# NO marker word at all (the short-document failure mode), and the
# es/pt pairs differ only in characteristic character patterns.
EVAL = [
    ("en", "nice weather today friends"),
    ("en", "the meeting starts soon"),
    ("es", "gracias por todo amigo"),
    ("es", "buenos dias senora lopez"),
    ("pt", "obrigado por tudo amigo"),
    ("pt", "bom dia senhora lopes"),
    ("de", "schones wetter heute freunde"),
    ("de", "danke schon mein freund"),
    ("fr", "merci beaucoup mon ami"),
    ("fr", "il fait beau aujourd hui"),
]


def _fit(spark):
    rows = [(lang, s) for lang, ss in TRAIN.items() for s in ss]
    df = spark.createDataFrame(rows, "lang string, text string")
    return train_char_langid(df, "text", "lang")


def test_nb_beats_marker_baseline_on_held_out_short_text(spark):
    """The trained model must separate es/pt and classify short
    marker-free phrases — strictly more accurate than the marker-word
    scorer on the same held-out set, and ≥ 8/10 absolute."""
    from petk_spark.operators.text import language_id_frame

    model, stats = _fit(spark)
    ev = spark.createDataFrame(
        [(i, lang, s) for i, (lang, s) in enumerate(EVAL)],
        "id long, lang string, text string",
    )
    nb = {
        r["id"]: r["lang_pred"]
        for r in langid_predict_frame(ev, "id", "text", model, stats).collect()
    }
    mk = {
        r["id"]: r["lang_pred"]
        for r in language_id_frame(ev, "id", "text").collect()
    }
    truth = {i: lang for i, (lang, _) in enumerate(EVAL)}
    nb_acc = sum(nb[i] == truth[i] for i in truth)
    mk_acc = sum(mk[i] == truth[i] for i in truth)
    # the marker scorer has no 'pt' list at all and most eval phrases
    # carry no marker word — the trained model must clearly win
    assert nb_acc >= 8, (nb_acc, nb)
    assert nb_acc > mk_acc, (nb_acc, mk_acc)


def test_nb_separates_es_pt(spark):
    """The named es/pt case: both Portuguese phrases go to pt, both
    Spanish ones to es."""
    model, stats = _fit(spark)
    ev = spark.createDataFrame(
        [
            (1, "obrigado pela ajuda de ontem"),
            (2, "nao vamos sair hoje"),
            (3, "gracias por la ayuda de ayer"),
            (4, "no vamos a salir hoy"),
        ],
        "id long, text string",
    )
    got = {
        r["id"]: r["lang_pred"]
        for r in langid_predict_frame(ev, "id", "text", model, stats).collect()
    }
    assert got == {1: "pt", 2: "pt", 3: "es", 4: "es"}, got


def test_und_and_tiebreak_contracts(spark):
    """NULL text, empty text, and text shorter than the gram size →
    'und'; an input gramless after whitespace collapse too. Exact score
    ties break to the lexicographically first language — pinned with a
    two-language model trained on mirrored data and a doc equidistant
    from both."""
    model, stats = _fit(spark)
    ev = spark.createDataFrame(
        [(1, None), (2, ""), (3, "ab"), (4, "  a "), (5, "  ")],
        "id long, text string",
    )
    got = {
        r["id"]: r["lang_pred"]
        for r in langid_predict_frame(ev, "id", "text", model, stats).collect()
    }
    assert got == {i: "und" for i in range(1, 6)}, got

    # tie-break: identical training text under two labels → every
    # gram weight and base identical → scores exactly equal → the
    # lexicographically first label wins
    twin = spark.createDataFrame(
        [("bb", "abcabcabc"), ("aa", "abcabcabc")],
        "lang string, text string",
    )
    m2, s2 = train_char_langid(twin, "text", "lang")
    pred = langid_predict_frame(
        spark.createDataFrame([(1, "abcabc")], "id long, text string"),
        "id", "text", m2, s2,
    ).collect()[0]["lang_pred"]
    assert pred == "aa"


def test_model_contract_and_integer_weights(spark):
    """Model frame rows carry exactly floor(log2(c+1)·2^20); stats
    carry per-language base = floor(log2(N+V+1)·2^20); vocab is
    per-language top-V with the (count DESC, gram ASC) tie-break; OOV
    grams contribute zero (all-OOV text scores −T·base and the argmax
    falls to the smallest base)."""
    import math

    model, stats = _fit(spark)
    rows = model.collect()
    assert rows, "empty model"
    for r in rows[:200]:
        assert r["w"] == math.floor(math.log2(r["c"] + 1) * LANGID_SCALE)
    per_lang_n = {}
    per_lang_v = {}
    for r in rows:
        per_lang_n[r["lang"]] = per_lang_n.get(r["lang"], 0) + r["c"]
        per_lang_v[r["lang"]] = per_lang_v.get(r["lang"], 0) + 1
    for lang in stats["langs"]:
        want = math.floor(
            math.log2(per_lang_n[lang] + per_lang_v[lang] + 1) * LANGID_SCALE
        )
        assert stats["base"][lang] == want
    assert stats["langs"] == sorted(TRAIN)
    # helper sanity: gram extraction is 1-char-step char windows
    assert _grams("abcd", 3) == ["abc", "bcd"]
    assert _grams("ab", 3) == []
    assert _ilog(8) == 3 * LANGID_SCALE  # exact at powers of two


def test_vocab_size_caps_per_language(spark):
    """vocab_size truncates each language's gram list independently,
    keeping the highest counts (ties by gram ASC) — the oracle's
    row_number replay depends on this exact ordering."""
    rows = [("xx", "aaaa bbbb cc"), ("yy", "dddd eeee ff")]
    df = spark.createDataFrame(rows, "lang string, text string")
    model, stats = train_char_langid(df, "text", "lang", vocab_size=3)
    got = {
        lang: sorted((r["gram"], r["c"]) for r in rs)
        for lang, rs in _group_by_lang(model.collect()).items()
    }
    assert all(len(v) == 3 for v in got.values()), got
    # 'aaaa bbbb cc' trigrams: aaa×2, 'a b', 'aa ', ' bb', bbb×2,
    # 'b c', 'bb ', ' cc' → top-3 by (c DESC, gram ASC):
    # aaa(2), bbb(2), then ' bb'(1) (space sorts before letters)
    assert got["xx"] == sorted([("aaa", 2), ("bbb", 2), (" bb", 1)]), got["xx"]


def _group_by_lang(rows):
    out = {}
    for r in rows:
        out.setdefault(r["lang"], []).append(r)
    return out


def test_predict_accepts_collected_dict(spark):
    """langid_predict_frame takes the pre-collected {(lang, gram): w}
    dict for per-batch reuse (the long-lived-session shape, like the
    LM's dict-closure path) — identical predictions."""
    model, stats = _fit(spark)
    d = {(r["lang"], r["gram"]): int(r["w"]) for r in model.collect()}
    ev = spark.createDataFrame(
        [(i, s) for i, (_, s) in enumerate(EVAL)], "id long, text string"
    )
    a = {r["id"]: r["lang_pred"]
         for r in langid_predict_frame(ev, "id", "text", model, stats).collect()}
    b = {r["id"]: r["lang_pred"]
         for r in langid_predict_frame(ev, "id", "text", d, stats).collect()}
    assert a == b


def _scalar_predict(texts, weights, stats):
    """The pre-vectorization scalar scoring loop, kept as the
    executable spec: O(langs × grams) dict probes, strict > argmax
    (first language wins ties over the sorted axis)."""
    from petk_spark.operators.langid import _grams as gr

    n, langs, base = stats["n"], list(stats["langs"]), dict(stats["base"])
    out = []
    for s in texts:
        grams = gr(s, n) if s is not None else []
        if not grams:
            out.append("und")
            continue
        t = len(grams)
        best_lang, best_score = "und", None
        for lang in langs:
            acc = 0
            for g in grams:
                acc += weights.get((lang, g), 0)
            score = acc - t * base[lang]
            if best_score is None or score > best_score:
                best_lang, best_score = lang, score
        out.append(best_lang)
    return out


def test_vectorized_kernel_matches_scalar_reference(spark):
    """R12 verdict #3: the numpy gram→weight-matrix kernel must agree
    BIT-FOR-BIT (same integer scores ⇒ same argmax + tie-break) with
    the scalar loop it replaced — including OOV-only docs, tie docs,
    and normalization-empty docs."""
    from petk_spark.operators.langid import normalize_text

    model, stats = _fit(spark)
    weights = {
        (r["lang"], r["gram"]): int(r["w"]) for r in model.collect()
    }
    texts = [s for _, s in EVAL] + [
        "zzzzqqqq xyxyxy",     # all-OOV grams
        "ab",                  # shorter than n after normalize → und
        None,
        "the el o der le",     # cross-language soup (tie pressure)
        "aaaaaaaaaaaaaaaaaaa",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    got = {
        r["id"]: r["lang_pred"] for r in langid_predict_frame(
            df, "id", "text", model, stats
        ).collect()
    }
    # the scalar spec runs over the SAME normalized strings the kernel saw
    norm = {
        r["id"]: r["s"] for r in df.select(
            "id", normalize_text(F.col("text")).alias("s")
        ).collect()
    }
    exp = _scalar_predict([norm[i] for i in range(len(texts))],
                          weights, stats)
    assert [got[i] for i in range(len(texts))] == exp


def test_scoring_bounded_time_on_long_documents(spark):
    """The F40 precedent: the kernel must stay linear in document
    length — a 400 KB document scores in well under a second/doc
    (the old O(langs × grams) loop paid ~5 dict probes per gram in
    interpreted Python; the vectorized kernel pays one)."""
    import time

    model, stats = _fit(spark)
    weights = {
        (r["lang"], r["gram"]): int(r["w"]) for r in model.collect()
    }
    body = ("the quick brown fox jumps over the lazy dog " * 9000)[:400_000]
    docs = [(i, body) for i in range(8)]
    df = spark.createDataFrame(docs, "id long, text string").coalesce(1)
    t0 = time.perf_counter()
    got = langid_predict_frame(df, "id", "text", weights, stats).collect()
    dt = time.perf_counter() - t0
    assert all(r["lang_pred"] == "en" for r in got)
    assert dt < 20.0, f"8x400KB docs took {dt:.1f}s — kernel not linear"
