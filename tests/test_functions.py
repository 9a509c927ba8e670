"""Tests for collation, label functions, sinks, and multimodal plumbing."""

from __future__ import annotations

import os
import tempfile

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from panditya_spark.functions.collation import (
    SANSKRIT_ALPHABET,
    UNKNOWN,
    collate,
    sort_key_py,
)
from panditya_spark.functions.labels import (
    date_info,
    dropdown_label,
    edge_relationship,
    link_label,
)
from tests.conftest import rows

IAST_CHARS = "aāiīuūṛṝḷḹeokghcjñṭḍṇtdnpbmyrlvśṣsṃḥ '–1"


# ---------------------------------------------------------------- collation
@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=IAST_CHARS, max_size=12))
def test_sort_key_py_matches_reference_semantics(word):
    # independent re-derivation of utils.py:100-103
    order = {c: i for i, c in enumerate(SANSKRIT_ALPHABET)}
    w = word.lower()
    expected = [
        order.get(w[i : i + 2], order.get(w[i], UNKNOWN)) for i in range(len(w))
    ]
    assert sort_key_py(word) == expected


def test_sort_key_overlapping_digraph_quirk():
    # 'kh' matches the digraph at i=0 AND 'h' alone at i=1 — the index
    # always advances by 1 (utils.py:102).
    kh, h, k = (
        SANSKRIT_ALPHABET.index("kh"),
        SANSKRIT_ALPHABET.index("h"),
        SANSKRIT_ALPHABET.index("k"),
    )
    assert sort_key_py("kh") == [kh, h]
    assert sort_key_py("k") == [k]
    assert sort_key_py("x1") == [UNKNOWN, UNKNOWN]


def test_spark_collation_matches_python(spark):
    words = ["kha", "ka", "gā", "Ā", "ai", "a i", "zz9", "ṃaḥ", ""]
    df = spark.createDataFrame([(w,) for w in words], ["w"])
    got = [r[0] for r in df.orderBy(collate(F.col("w")), F.col("w")).collect()]
    expected = sorted(words, key=lambda w: (sort_key_py(w), w))
    assert got == expected


# ---------------------------------------------------------------- labels
def test_date_info_and_dropdown(spark):
    df = spark.createDataFrame(
        [
            ("work", 900, 1000, None, None, "n1", "1", ""),
            ("work", 900, 900, None, None, "n2", "2", "alt"),
            ("work", None, None, 800, 850, "n3", "3", ""),
            ("work", None, None, None, None, "n4", "4", ""),
            ("author", 0, 0, None, None, "n5", "5", ""),
        ],
        ["t", "ly", "hy", "aly", "ahy", "name", "id", "aka"],
    )
    ds = date_info(F.col("t"), F.col("ly"), F.col("hy"), F.col("aly"), F.col("ahy"))
    out = dict(
        rows(
            df.select(
                "id",
                dropdown_label(F.col("name"), F.col("id"), ds, F.col("aka")).alias("l"),
            )
        )
    )
    assert out["1"] == "n1 (1) [900–1000]"
    assert out["2"] == "n2 (2) [900] [alt]"
    assert out["3"] == "n3 (3) [800–850 (author)]"
    assert out["4"] == "n4 (4)"
    assert out["5"] == "n5 (5)"  # year 0 is falsy, as in Python


def test_edge_relationship(spark):
    df = spark.createDataFrame(
        [("author", "work"), ("work", "work"), ("work", "author")], ["s", "d"]
    )
    out = [r[0] for r in df.select(edge_relationship(F.col("s"), F.col("d")).alias("r")).collect()]
    assert out == [
        "source author wrote target work",
        "source base text inspired target commentary",
        None,
    ]


def test_link_label_extractors(spark):
    cases = [
        ("GRETIL", "http://gretil.x/1_sanskr/mamkavpu.htm", "mamkavpu"),
        ("DCS", "http://d/index.php?contents=texte&IDTextDisplay=165", "165"),
        ("DCS", "https://github.com/x/files/SomeTitle.txt", "SomeTitle"),
        ("Muktabodha KSTS", "http://m/cgi?miri_catalog_number=M00349", "M00349"),
        ("Vātāyana and Pramāṇa NLP", "http://v/?text_abbrv=HB%E1%B9%AC", "HBṬ"),
        ("UTA Dharmaśāstra", "https://docs.google.com/document/d/xyz", "Google Doc"),
        ("UTA Dharmaśāstra", "https://sites.utexas.edu/x/resources/n%C4%81rada/", "nārada"),
        ("DiPAL DCV", "https://d/page?tra_id=77", "77"),
        ("DiPAL DCV", "https://d/page?wor_id=6", "6"),
        ("SARIT", "http://s/texts/siddhanta.xml", "siddhanta"),
    ]
    df = spark.createDataFrame(cases, ["coll", "url", "expected"])
    out = df.select(
        "expected", link_label(F.col("coll"), F.col("url")).alias("got")
    ).collect()
    for r in out:
        assert r.got == r.expected, (r.expected, r.got)


# ---------------------------------------------------------------- sinks
def test_gexf_sink(spark):
    from panditya_spark.sources.sinks import write_gexf

    nodes = spark.createDataFrame(
        [("a", "Alpha", "red"), ("b", "Beta <&>", "green"), ("c", "Gamma", None)],
        ["node", "label", "color"],
    )
    edges = spark.createDataFrame([("a", "b"), ("b", "c")], ["src", "dst"])
    path = os.path.join(tempfile.mkdtemp(), "out.gexf")
    write_gexf(nodes, edges, path)
    xml = open(path, encoding="utf-8").read()
    import xml.etree.ElementTree as ET

    root = ET.fromstring(xml)  # well-formed
    ns = {"g": "http://www.gexf.net/1.2draft", "viz": "http://www.gexf.net/1.2draft/viz"}
    assert len(root.findall(".//g:node", ns)) == 3
    assert len(root.findall(".//g:edge", ns)) == 2
    assert len(root.findall(".//viz:color", ns)) == 2  # c has no color
    assert 'r="255"' in xml and 'r="6"' in xml


def test_entity_map_json_sink(spark):
    from panditya_spark.sources.sinks import entity_map_json

    schema = (
        "id string, type string, name string, aka string, "
        "author_ids array<string>, base_text_ids array<string>, "
        "commentary_ids array<string>, discipline string, "
        "highest_year int, lowest_year int, author_highest_year int, "
        "author_lowest_year int, work_ids array<string>, disciplines string"
    )
    df = spark.createDataFrame(
        [
            ("1", "work", "W", None, ["9"], None, None, "Nyāya", 1000, 900, None, None, None, None),
            ("9", "author", "A", "aka", None, None, None, None, None, None, None, None, ["1"], "Nyāya (1)"),
        ],
        schema,
    )
    import json

    path = os.path.join(tempfile.mkdtemp(), "ents.json")
    entity_map_json(df, path)
    out = json.load(open(path, encoding="utf-8"))
    assert out["1"] == {
        "id": "1", "type": "work", "name": "W", "author_ids": ["9"],
        "discipline": "Nyāya", "highest_year": 1000, "lowest_year": 900,
    }  # null/empty fields dropped, per data_models.to_dict
    assert out["9"]["disciplines"] == "Nyāya (1)"
    assert "aka" in out["9"] and "social_identifiers" not in out["9"]


# ---------------------------------------------------------------- multimodal
def test_png_codec_roundtrip_and_reference_reader():
    """encode_png emits a genuine PNG: our parser round-trips it, and
    (when available) the stdlib-independent reference check — tkinter
    isn't in this container, so the structural CRC/IHDR walk plus a
    pixel-exact roundtrip IS the container proof."""
    import numpy as np

    from panditya_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(7)
    for shape in [(1, 1), (3, 5), (64, 33), (17, 64)]:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        payload = encode_png(px)
        assert payload[:8] == b"\x89PNG\r\n\x1a\n"
        w, h, back = decode_png(payload)
        assert (w, h) == (shape[1], shape[0])
        assert np.array_equal(back, px)


def test_png_decoder_handles_all_filter_types():
    """The decoder must reconstruct scanlines written with any of the
    five standard PNG filters, not just the filter-0 rows we emit:
    build a container by hand with one row per filter type and check
    against a straightforward per-pixel reference implementation."""
    import struct
    import zlib

    import numpy as np

    from panditya_spark.operators.multimodal import (
        _png_chunk,
        decode_png,
    )

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(5, 8), dtype=np.uint8).astype(int)
    w = 8

    def filt_row(y, ftype):
        row, out = px[y], []
        prev = px[y - 1] if y > 0 else np.zeros(w, dtype=int)
        for x in range(w):
            left = row[x - 1] if x > 0 else 0
            up = prev[x]
            ul = prev[x - 1] if x > 0 else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = left
            elif ftype == 2:
                pred = up
            elif ftype == 3:
                pred = (left + up) // 2
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa <= pb and pa <= pc else up if pb <= pc else ul
            out.append((row[x] - pred) % 256)
        return bytes([ftype] + out)

    raw = b"".join(filt_row(y, y) for y in range(5))  # filters 0..4
    ihdr = struct.pack(">IIBBBBB", w, 5, 8, 0, 0, 0, 0)
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    got_w, got_h, got = decode_png(payload)
    assert (got_w, got_h) == (8, 5)
    assert np.array_equal(got, px.astype(np.uint8))


def test_codecs_reject_corrupt_payloads():
    """A flipped pixel byte (CRC mismatch), truncated container, or
    wrong magic must raise ValueError — never silently decode."""
    import numpy as np
    import pytest

    from panditya_spark.operators.multimodal import (
        decode_png,
        decode_wav,
        encode_png,
        encode_wav,
    )

    px = np.arange(64, dtype=np.uint8).reshape(8, 8)
    good = encode_png(px)
    corrupt = bytearray(good)
    corrupt[40] ^= 0xFF  # inside a chunk body -> CRC mismatch
    with pytest.raises(ValueError):
        decode_png(bytes(corrupt))
    with pytest.raises(ValueError):
        decode_png(good[:-6])  # truncated
    with pytest.raises(ValueError):
        decode_png(b"JFIF" + good[4:])  # bad signature
    with pytest.raises(ValueError):
        decode_png(b"")

    wav = encode_wav(np.array([1, -2, 3], dtype="<i2"))
    with pytest.raises(ValueError):
        decode_wav(wav[:10])
    with pytest.raises(ValueError):
        decode_wav(b"RIFF" + wav[4:8] + b"AVI " + wav[12:])
    with pytest.raises(ValueError):
        decode_wav(wav[:-3])  # truncated data chunk


def test_multimodal_features(spark):
    from panditya_spark.operators.multimodal import (
        decode_png,
        frame_sample,
        image_features,
        synthetic_media,
    )

    media = synthetic_media(spark, n=32)
    feats = image_features(media).collect()
    assert len(feats) == 32
    by_id = {r.media_id: r for r in feats}
    # real PNG parse consistent with the metadata columns + pixel sums
    for row in media.collect():
        w, h, px = decode_png(bytes(row.payload))
        r = by_id[row.media_id]
        assert (r.width, r.height) == (w, h) == (row.width, row.height)
        assert r.px_sum == int(px.sum(dtype="int64"))
        emb = r.embedding
        assert len(emb) == 8 and abs(sum(emb) - 1.0) < 1e-5

    vids = spark.createDataFrame([("v1", 25), ("v2", 1), ("v3", 0)], ["media_id", "n_frames"])
    frames = rows(frame_sample(vids, every_n=10))
    assert frames == [("v1", 0), ("v1", 10), ("v1", 20), ("v2", 0), ("v3", 0)]


def test_multimodal_resize_real(spark):
    """resize_images REALLY resizes: decode the output PNG and compare
    with a direct nearest-neighbor reference of the input pixels."""
    import numpy as np

    from panditya_spark.operators.multimodal import (
        decode_png,
        resize_images,
        synthetic_media,
    )

    media = synthetic_media(spark, n=6)
    out = {r.media_id: r for r in resize_images(media, 12, 9).collect()}
    for row in media.collect():
        _, _, px = decode_png(bytes(row.payload))
        h, w = px.shape
        ys = np.arange(9) * h // 9
        xs = np.arange(12) * w // 12
        ref = px[ys][:, xs]
        r = out[row.media_id]
        assert (r.width, r.height) == (12, 9)
        got_w, got_h, got = decode_png(bytes(r.payload))
        assert (got_w, got_h) == (12, 9)
        assert np.array_equal(got, ref)


def test_audio_features(spark):
    """Audio featurize path: parse the REAL WAV container and check
    every feature against a NumPy reference of the decoded PCM."""
    import numpy as np

    from panditya_spark.operators.multimodal import (
        audio_features,
        decode_wav,
        synthetic_audio,
    )

    media = synthetic_audio(spark, n=16)
    got = {r.media_id: r for r in audio_features(media).collect()}
    for row in media.collect():
        raw, rate = decode_wav(bytes(row.payload))
        samples = raw.astype(np.float32) / 32768.0
        g = got[row.media_id]
        assert rate == 16_000
        assert g.n_samples == len(samples)
        assert g.duration_ms == len(samples) * 1000 // rate
        assert g.pcm_sum == int(raw.astype(np.int64).sum())
        assert abs(g.rms - float(np.sqrt(np.mean(samples**2)))) < 1e-6
        assert g.zero_crossings == int(
            np.sum(np.signbit(samples[1:]) != np.signbit(samples[:-1]))
        )


# ---------------------------------------------------------------- html strip
def test_html_strip_hand_values(spark):
    from panditya_spark.operators.text import html_strip

    df = spark.createDataFrame(
        [
            (1, '<html><body><p>Hello  <b>world</b></p>'
                '<script>if (a < b) { x(); }</script>'
                '<style>.x { color: red }</style>'
                '&amp; &lt;raw&gt; &quot;q&quot; &#39;s&#39;</body></html>'),
            (2, "no markup at   all"),
            (3, ""),
        ],
        ["doc_id", "html"],
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_tags"])
        for r in html_strip(df, "html", "doc_id").collect()
    }
    # Tags outside script/style: html, body, p, b, /b, /p, /body, /html = 8.
    assert got[1] == ("Hello world & <raw> \"q\" 's'", 8)
    assert got[2] == ("no markup at all", 0)
    assert got[3] == ("", 0)


def test_html_strip_double_escaped_entities(spark):
    """&amp;lt; must become &lt; (one unescape level), not < —
    the &amp; rule runs last."""
    from panditya_spark.operators.text import html_strip

    df = spark.createDataFrame([(1, "a &amp;lt;b&amp;gt; c")], ["doc_id", "html"])
    row = html_strip(df, "html", "doc_id").first()
    assert row["clean_text"] == "a &lt;b&gt; c"


def test_wav_decoder_rejects_zero_rate_and_odd_data():
    """Fuzzed-container guards: a fmt chunk with rate=0 or a 16-bit
    data chunk of odd byte length must raise, not divide by zero or
    silently truncate."""
    import struct

    import numpy as np
    import pytest

    from panditya_spark.operators.multimodal import decode_wav, encode_wav

    good = bytearray(encode_wav(np.array([1, -2, 3], dtype="<i2")))
    # Patch the sample-rate field (fmt chunk starts at offset 12+8;
    # rate is 4 bytes at fmt+4). Locate fmt to stay layout-agnostic.
    i = bytes(good).index(b"fmt ")
    zero_rate = bytes(good[: i + 8 + 4]) + b"\x00\x00\x00\x00" + bytes(good[i + 8 + 8 :])
    with pytest.raises(ValueError, match="zero sample rate"):
        decode_wav(zero_rate)

    # Odd-length data chunk: rewrite the data chunk with 3 bytes.
    j = bytes(good).index(b"data")
    odd = bytes(good[:j]) + b"data" + struct.pack("<I", 3) + b"\x01\x02\x03"
    with pytest.raises(ValueError, match="odd byte length"):
        decode_wav(odd)


def test_pq_topk_empty_query_set(spark):
    from panditya_spark.operators.similarity import (
        pq_encode,
        pq_topk,
        pq_train,
    )

    df = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(8)], ["vec_id", "embedding"]
    )
    cb = pq_train(df, "embedding", m=1, n_codes=4, iters=2, sample=8)
    codes = pq_encode(df, "vec_id", "embedding", cb)
    empty_q = df.filter("vec_id < 0").select(
        df["vec_id"].alias("qid"), df["embedding"].alias("qvec")
    )
    out = pq_topk(empty_q, codes, cb, c_id="vec_id", k=3)
    assert out.count() == 0
    assert out.columns == ["qid", "cid", "approx_cos", "rank"]
