"""Pluggable tokenizer contract (functions/tokenizers.py): stub laws,
DuckDB pattern parity for the BPE-style pre-tokenizer, the process-cache
load-once law, and the skip-marked HF adapter contract."""

import duckdb
import pytest

from crawl4ai_ray.functions.tokenizers import (
    BPEISH_PATTERN,
    BpeishTokenizer,
    HFTokenizer,
    WhitespaceTokenizer,
    load_tokenizer,
)

try:
    import transformers  # noqa: F401

    HAS_TF = True
except ImportError:
    HAS_TF = False


def test_whitespace_tokenizer_matches_corpus_convention():
    from crawl4ai_ray.pipelines.corpus import _tokens

    t = WhitespaceTokenizer()
    for s in ["Hello  World", "", "  ", "a\tb\nc", "ONE two Three"]:
        assert t.tokenize(s) == _tokens(s)
        assert t.count(s) == len(_tokens(s))


def test_bpeish_tokenizer_laws():
    t = BpeishTokenizer()
    # contractions split like the GPT-2 pre-tokenizer
    assert t.tokenize("he'll won't") == ["he", "'ll", " won", "'t"]
    # digit runs and punctuation runs are separate tokens
    assert t.tokenize("ab12, cd!") == ["ab", "12", ",", " cd", "!"]
    # token count upper-bounds the whitespace word count
    w = WhitespaceTokenizer()
    for s in ["plain words only", "punct, heavy! text?", "mix3d 4nd numb3rs"]:
        assert t.count(s) >= w.count(s)
    assert t.count("") == 0


def test_bpeish_pattern_is_re2_compatible_and_duckdb_equal():
    """The exact pattern string must count identically in DuckDB's RE2
    regexp_extract_all — that equality is what makes
    doc_bpe_pack_sequences oracle-checkable."""
    t = BpeishTokenizer()
    texts = ["he'll see 42 cats, maybe 43!", "x" * 50, "", "a  b   c",
             "semi;colon:stuff--and__under", "1+1=2 (obviously)"]
    con = duckdb.connect()
    sql_pat = BPEISH_PATTERN.replace("'", "''")
    for s in texts:
        got = con.execute(
            "SELECT len(regexp_extract_all(lower(?), '" + sql_pat + "'))",
            [s]).fetchone()[0]
        assert got == t.count(s), s


def test_load_tokenizer_process_cache_law():
    # load-once per process: same spec -> same object (the model_loader
    # law — actor stages must not rebuild per batch)
    assert load_tokenizer("bpeish") is load_tokenizer("bpeish")
    assert load_tokenizer("whitespace") is load_tokenizer("whitespace")
    assert type(load_tokenizer("whitespace")) is WhitespaceTokenizer


def test_unknown_spec_without_transformers_raises():
    if HAS_TF:
        pytest.skip("transformers installed — adapter path active")
    with pytest.raises(ImportError):
        HFTokenizer("gpt2")


@pytest.mark.skipif(not HAS_TF, reason="transformers not installed")
def test_hf_adapter_contract():
    t = load_tokenizer("gpt2")
    assert t.count("hello world") == len(
        t._tok.encode("hello world", add_special_tokens=False))
    assert t.tokenize("hello world")
