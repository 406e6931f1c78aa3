"""BPE tokenizer: the published worked example, train/encode
consistency, detokenization round-trip, and a Python-reference
property check."""

from pyspark.sql import functions as F

from kafka_streams_demo_spark.functions.bpe import (
    END,
    bpe_encode,
    bpe_train,
)


def _ref_train(word_counts: dict, num_merges: int, min_pair_count: int = 2):
    """Pure-Python reference BPE trainer with the same tie-break."""
    vocab = {tuple(list(w) + [END]): n for w, n in word_counts.items()}
    merges = []
    for _ in range(num_merges):
        pairs: dict = {}
        for syms, n in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), cnt = best
        if cnt < min_pair_count:
            break
        merges.append((left, right, left + right, cnt))
        new_vocab = {}
        for syms, n in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges, vocab


def _docs_from_counts(spark, word_counts):
    rows = []
    i = 0
    for w, n in word_counts.items():
        for _ in range(n):
            rows.append((i, w))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bpe_train_matches_sennrich_worked_example(spark):
    """The Sennrich et al. (2016) corpus {low:5, lower:2, newest:6,
    widest:3}: the first merges must follow the paper's sequence
    ('e','s') → ('es','t') → ('est','</w>') ... with the documented
    counts."""
    counts = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    got = [
        (r["left"], r["right"], r["n_pair"])
        for r in bpe_train(
            _docs_from_counts(spark, counts), num_merges=6
        ).orderBy("rank").collect()
    ]
    assert got[0] == ("e", "s", 9)
    assert got[1] == ("es", "t", 9)
    assert got[2] == ("est", END, 9)
    assert got[3] == ("l", "o", 7)
    assert got[4] == ("lo", "w", 7)
    # reference model agrees on the whole sequence
    ref, _ = _ref_train(counts, 6)
    assert [(l, r, c) for l, r, _, c in ref] == got


def test_bpe_train_matches_reference_on_random_corpora(spark):
    """Deterministic equivalence with the pure-Python trainer on
    several generated corpora (mixed alphabets, repeats, ties)."""
    import random

    rng = random.Random(7)
    for trial in range(3):
        words = [
            "".join(rng.choice("abcd") for _ in range(rng.randint(1, 5)))
            for _ in range(8)
        ]
        counts: dict = {}
        for w in words:
            counts[w] = counts.get(w, 0) + rng.randint(1, 4)
        got = [
            (r["left"], r["right"], r["n_pair"])
            for r in bpe_train(
                _docs_from_counts(spark, counts), num_merges=8
            ).orderBy("rank").collect()
        ]
        ref, _ = _ref_train(counts, 8)
        assert got == [(l, r, c) for l, r, _, c in ref], (trial, counts)


def test_bpe_encode_consistent_with_training_and_roundtrips(spark):
    """Encoding the training corpus with the learned merges reproduces
    the trained symbol table (same greedy pass), and detokenization
    restores the normalized text."""
    counts = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    docs = _docs_from_counts(spark, counts)
    merges = bpe_train(docs, num_merges=6)
    enc = bpe_encode(docs, merges)
    rows = {r["doc_id"]: r for r in enc.collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    _, ref_vocab = _ref_train(counts, 6)
    ref_by_word = {
        "".join(syms).replace(END, ""): list(syms) for syms in ref_vocab
    }
    for d, r in rows.items():
        word = texts[d]
        want = ref_by_word[word]
        assert r["tokens"] == want, (word, r["tokens"], want)
        assert r["n_tokens"] == len(want)
        # detokenize: drop END, rejoin
        assert "".join(t.replace(END, "") for t in r["tokens"]) == word


def test_bpe_encode_multiword_and_null(spark):
    """Multi-word docs concatenate per-word token streams in order;
    NULL/empty text encodes to zero tokens; unseen words fall back to
    characters + END."""
    docs = spark.createDataFrame(
        [(1, "low lower"), (2, None), (3, ""), (4, "zzq")],
        "doc_id long, text string",
    )
    merges = [("l", "o", "lo"), ("lo", "w", "low"), ("low", END, "low" + END)]
    got = {r["doc_id"]: r for r in bpe_encode(docs, merges).collect()}
    assert got[1]["tokens"] == ["low</w>", "low", "e", "r", END]
    assert got[2]["n_tokens"] == 0 and got[2]["tokens"] == []
    assert got[3]["n_tokens"] == 0
    assert got[4]["tokens"] == ["z", "z", "q", END]


def test_bpe_sql_oracle_matches_trainer_incl_exhaustion(spark):
    """r12: the unrolled-CTE oracle (bpe_train_sql / bpe_token_counts_sql)
    must replay the trainer bit-for-bit INCLUDING the two stop paths —
    min_pair_count break AND full exhaustion (every word collapsed to
    one symbol, pair table empty: the oracle's always-one-row b{k}
    freezes the chain where Spark breaks; a bare LIMIT 1 would have
    wiped the symbol table through the CROSS JOIN)."""
    import duckdb

    from kafka_streams_demo_spark.functions.bpe import (
        bpe_encode,
        bpe_token_counts_sql,
        bpe_train,
        bpe_train_sql,
    )

    corpora = {
        "exhaustion": [(1, "aa aa bb bb"), (2, "aa bb")],
        "break": [(1, "ab cd ef"), (2, "ab gh ij")],  # only (a,b)+ends repeat
        "mixed": [(1, "the cat sat on the mat"), (2, "the cat ran"),
                  (3, "a cat and the mat")],
    }
    for name, rows in corpora.items():
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        m = bpe_train(docs, num_merges=20)
        sm = sorted(
            (r["rank"], r["left"], r["right"], r["merged"], r["n_pair"])
            for r in m.collect()
        )
        enc = {r["doc_id"]: r["n_tokens"]
               for r in bpe_encode(docs, m).select("doc_id", "n_tokens").collect()}
        con = duckdb.connect()
        vals = ", ".join(f"({i}, '{t}')" for i, t in rows)
        con.sql(
            f"CREATE VIEW documents AS SELECT * FROM (VALUES {vals}) t(doc_id, text)"
        )
        om = sorted(con.sql(bpe_train_sql(20, 2)).fetchall())
        otc = dict(con.sql(bpe_token_counts_sql(20, 2)).fetchall())
        assert sm == om, (name, sm, om)
        assert enc == otc, (name, enc, otc)


def test_bpe_sql_oracle_replays_at_40_rounds(spark):
    """r13 (VERDICT task 6): the MATERIALIZED chain must still replay at
    num_merges=40 — double the default contract — on BOTH stop shapes:
    a corpus with 40 genuine merges (min_pair_count=1 keeps every round
    valid) and one that exhausts early (frozen chain carried through 40
    rounds). The 2^n-expansion failure mode was pinned only at 20
    before; this is the extension the guard's bound promises."""
    import duckdb

    from kafka_streams_demo_spark.functions.bpe import (
        bpe_token_counts_sql,
        bpe_train_sql,
    )

    corpora = {
        "deep": [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "pack my box with five dozen liquor jugs"),
            (3, "the quick onyx goblin jumps over the lazy dwarf"),
        ],
        "exhaustion": [(1, "aa aa bb bb"), (2, "aa bb")],
    }
    for name, rows in corpora.items():
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        m = bpe_train(docs, num_merges=40, min_pair_count=1)
        sm = sorted(
            (r["rank"], r["left"], r["right"], r["merged"], r["n_pair"])
            for r in m.collect()
        )
        enc = {r["doc_id"]: r["n_tokens"]
               for r in bpe_encode(docs, m).select("doc_id", "n_tokens").collect()}
        if name == "deep":
            assert len(sm) == 40, (name, len(sm))
        con = duckdb.connect()
        vals = ", ".join(f"({i}, '{t}')" for i, t in rows)
        con.sql(
            f"CREATE VIEW documents AS SELECT * FROM (VALUES {vals}) t(doc_id, text)"
        )
        om = sorted(con.sql(bpe_train_sql(40, 1)).fetchall())
        otc = dict(con.sql(bpe_token_counts_sql(40, 1)).fetchall())
        assert sm == om, (name, sm, om)
        assert enc == otc, (name, enc, otc)


def test_bpe_sql_num_merges_guard_refuses_beyond_tested_bound():
    """The oracle generator refuses num_merges beyond the parity-tested
    bound instead of emitting an unaudited CTE chain."""
    import pytest

    from kafka_streams_demo_spark.functions.bpe import (
        SQL_TESTED_MAX_MERGES,
        bpe_train_sql,
    )

    with pytest.raises(ValueError, match="tested bound"):
        bpe_train_sql(SQL_TESTED_MAX_MERGES + 1)
    # the bound itself generates fine
    assert "MATERIALIZED" in bpe_train_sql(SQL_TESTED_MAX_MERGES)


def test_bpe_sql_oracle_fail_louds_on_u001f_token():
    """ADVICE r12: U+001F is ASCII but not whitespace — a corpus token
    containing the oracle's accumulator separator must raise, never
    silently corrupt the merge replay."""
    import duckdb
    import pytest

    from kafka_streams_demo_spark.functions.bpe import bpe_train_sql

    con = duckdb.connect()
    sep = chr(31)
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        f"(1, 'ok ok'), (2, 'bad{sep}tok bad{sep}tok')) t(doc_id, text)"
    )
    with pytest.raises(duckdb.Error, match="U\\+001F"):
        con.sql(bpe_train_sql(3)).fetchall()
