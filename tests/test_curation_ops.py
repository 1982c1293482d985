"""Round-2 curation operators (queries_ext4): boilerplate-chunk removal,
regex redaction, weighted source mixing, prefix-sum sequence packing —
each checked against its own DuckDB oracle on a CRAFTED corpus (planted
boilerplate, rate boundaries, bin crossings), not just the gate fixture."""

import duckdb
import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    """Tiny documents table with planted structure: doc 0/1/2 share the
    exact 5-word chunk 'a b c d e' (count 3 -> boilerplate), docs carry
    short tails, one doc is a single word, sizes straddle pack-bin
    boundaries."""
    rows = []
    boiler = "a b c d e"
    for i in range(12):
        words = [f"w{i}_{j}" for j in range(7)]  # unique chunk + 2-word tail
        text = " ".join(words)
        if i < 3:
            text = boiler + " " + text
        rows.append(
            {"doc_id": i, "text": text, "lang": "en",
             "source": f"src{i % 5}", "n_chars": len(text)}
        )
    # jumbo doc to force a bin crossing (n_chars >> budget/12)
    rows.append({"doc_id": 12, "text": "z " * 3000 + "z", "lang": "en",
                 "source": "src0", "n_chars": 6001})
    rows.append({"doc_id": 13, "text": "solo", "lang": "en",
                 "source": "src1", "n_chars": 4})
    df = pd.DataFrame(rows)
    d = tmp_path_factory.mktemp("curation")
    df.to_parquet(d / "documents.parquet", index=False)
    return str(d)


def _oracle(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    return con.execute(sql).fetchdf()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _check(name: str, sf_dir: str, ray_session):
    from geo_epic_ray.pipelines.queries import ORACLES, QUERIES

    got = _canon(QUERIES[name](sf_dir).to_pandas())
    want = _canon(_oracle(sf_dir, ORACLES[name]))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    return got


def test_boilerplate_chunk_removal(ray_session, corpus_dir):
    got = _check("boilerplate_chunk_removal", corpus_dir, ray_session)
    by_id = got.set_index("doc_id")
    # the planted chunk (count 3) is gone from docs 0-2; their own words stay
    assert not by_id.loc[0, "clean_text"].startswith("a b c d e")
    assert by_id.loc[0, "clean_text"].startswith("w0_0")
    # an untouched doc keeps both its chunks (5-word + 2-word tail)
    assert by_id.loc[5, "n_kept"] == 2
    assert by_id.loc[5, "clean_text"] == " ".join(f"w5_{j}" for j in range(7))
    # single-word doc survives as its own (short) chunk
    assert by_id.loc[13, "clean_text"] == "solo"


def test_regex_redact(ray_session, corpus_dir):
    # plant pattern words via a second corpus reusing the fixture shape
    got = _check("regex_redact", corpus_dir, ray_session)
    assert (got.n_redacted == 0).all()  # crafted corpus has no targets

    from geo_epic_ray.pipelines.queries import QUERIES

    red = QUERIES["regex_redact"]("/root/testdata/sf0.001").to_pandas()
    assert (red.n_redacted > 0).any()
    assert red.red_text.str.contains("<X>").any()
    # word-boundary semantics: no partial-word hits ('keyword' untouched)
    assert not red.red_text.str.contains(r"\bcustomer\b", regex=True).any()


def test_source_mix_weighted(ray_session, corpus_dir):
    got = _check("source_mix_weighted", corpus_dir, ray_session)
    # src0 rate is 1.0 -> every src0 doc kept
    src0 = {0, 5, 10, 12}
    assert src0 <= set(got.doc_id)

    # determinism at gate scale: two runs pick identical rows
    from geo_epic_ray.pipelines.queries import QUERIES

    a = _canon(QUERIES["source_mix_weighted"]("/root/testdata/sf0.001").to_pandas())
    b = _canon(QUERIES["source_mix_weighted"]("/root/testdata/sf0.001").to_pandas())
    pd.testing.assert_frame_equal(a, b)


def test_length_band_filter(ray_session, corpus_dir):
    got = _check("length_band_filter", corpus_dir, ray_session)
    # at n=14 the ceil-rank rule puts p5 at rank 1 and p95 at rank 14,
    # so the tiny fixture keeps everything — the oracle equality above is
    # the semantic check here
    assert len(got) == 14

    # at gate scale the band actually bites (outlier lengths dropped)
    from geo_epic_ray.pipelines.queries import QUERIES

    big = QUERIES["length_band_filter"]("/root/testdata/sf0.001").to_pandas()
    assert 0 < len(big) < 500


def test_quantile_disc_rank_rule():
    """The engine's histogram read-off must equal DuckDB quantile_disc
    (value at 1-based rank ceil(q*n)) on ties and small n."""
    vals = [5, 5, 5, 7, 9, 9, 11, 30]
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"v": vals}))
    for q in (0.05, 0.5, 0.95):
        want = con.execute(f"SELECT quantile_disc(v, {q}) FROM t").fetchone()[0]
        v, cnt = np.unique(vals, return_counts=True)
        cum = cnt.cumsum()
        got = v[np.searchsorted(cum, int(np.ceil(q * len(vals))))]
        assert got == want, q


def test_word_repetition_score(ray_session, corpus_dir):
    got = _check("word_repetition_score", corpus_dir, ray_session)
    by_id = got.set_index("doc_id")
    # doc 12 is 'z' repeated 3001 times -> fully duplicated
    assert by_id.loc[12, "dup_frac"] == 1.0
    assert by_id.loc[12, "total_words"] == 3001
    # doc 5's words are all unique
    assert by_id.loc[5, "dup_frac"] == 0.0


def test_token_df_score(ray_session, corpus_dir):
    got = _check("token_df_score", corpus_dir, ray_session)
    by_id = got.set_index("doc_id")
    # doc 12 is 3001 copies of 'z', which appears in no other doc -> df 1
    assert by_id.loc[12, "mean_df"] == 1.0
    # docs 0-2 share the planted chunk words (df 3 each) + unique words
    assert by_id.loc[0, "mean_df"] > by_id.loc[5, "mean_df"]


def test_shuffle_train_order(ray_session, corpus_dir):
    got = _check("shuffle_train_order", corpus_dir, ray_session)
    # pos is a permutation of 0..n-1 and not the identity order
    pos = got.sort_values("doc_id").pos.to_numpy()
    assert sorted(pos) == list(range(len(got)))
    assert not (pos == np.arange(len(got))).all()


def test_sequence_pack_bins(ray_session, corpus_dir):
    got = _check("sequence_pack_bins", corpus_dir, ray_session)
    by_id = got.set_index("doc_id").sort_index()
    # bins are nondecreasing in doc order and start at 0
    assert by_id.bin.iloc[0] == 0
    assert (np.diff(by_id.bin.to_numpy()) >= 0).all()
    # the jumbo doc (6001 chars > budget 4096) forces doc 13 past bin 1
    assert by_id.loc[13, "bin"] >= 1


@pytest.fixture(scope="module")
def clone_corpus_dir(tmp_path_factory):
    """All-clone corpus: 3 byte-identical copies of 50 base docs. Every
    5-word chunk appears 3 times (> the boilerplate threshold of 2) and
    every 'new-half' blocking prefix exists in the old half — BOTH
    dedup queries legitimately return ZERO rows. The 100x sweep hit this
    shape (text-cloning replication) and the Ray side lost its schema:
    Dataset.to_pandas yields a 0-column frame for a 0-row dataset."""
    base = [
        " ".join(f"t{i}_{j}" for j in range(12)) for i in range(50)
    ]
    texts = base * 3
    df = pd.DataFrame(
        {"doc_id": np.arange(150, dtype=np.int64), "text": texts,
         "lang": "en", "source": "src0",
         "n_chars": [len(t) for t in texts]}
    )
    d = tmp_path_factory.mktemp("clones")
    df.to_parquet(d / "documents.parquet", index=False)
    return str(d)


def test_empty_results_keep_schema(ray_session, clone_corpus_dir):
    """Legitimately-empty results must still carry the declared columns
    (the driver compares schema even at 0 rows vs the DuckDB oracle)."""
    for name in ("incremental_dedup_new", "boilerplate_chunk_removal"):
        got = _check(name, clone_corpus_dir, ray_session)
        assert len(got) == 0, name
        assert list(got.columns), f"{name} lost its schema on empty"


def test_pair_finder_empty_keeps_schema(ray_session, tmp_path):
    """A dup-free corpus yields zero MinHash pairs — the typed empty
    contract must hold for the pair finders too."""
    texts = [" ".join(f"u{i}_{j}" for j in range(30)) for i in range(40)]
    df = pd.DataFrame(
        {"doc_id": np.arange(40, dtype=np.int64), "text": texts,
         "lang": "en", "source": "s", "n_chars": [len(t) for t in texts]}
    )
    df.to_parquet(tmp_path / "documents.parquet", index=False)
    from geo_epic_ray.pipelines.queries import QUERIES

    got = QUERIES["minhash_lsh_pairs"](str(tmp_path)).to_pandas()
    assert len(got) == 0
    assert sorted(got.columns) == ["id_a", "id_b", "jaccard"]
