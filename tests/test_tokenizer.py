"""Tokenizer parity suite — assertions ported from the reference's unit tests
(/root/reference/src/search/tokenization.rs:2770-2953) plus property tests
(never crash, idempotent, deterministic)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from probe_spark.functions.porter2 import stem
from probe_spark.functions.tokenizer import (
    is_stop_word,
    raw_words,
    split_camel_case,
    split_compound_word,
    tokenize,
)


class TestSplitCamelCase:
    # tokenization.rs:2770-2801 (test_split_camel_case)
    def test_basic_camel(self):
        assert split_camel_case("camelCase") == ["camel", "case"]

    def test_pascal(self):
        assert split_camel_case("PascalCase") == ["pascal", "case"]

    def test_acronym_digits(self):
        assert split_camel_case("parseJSONToHTML5") == ["parse", "json", "to", "html", "5"]

    def test_consecutive_upper(self):
        assert split_camel_case("APIDefinition") == ["api", "definition"]

    def test_oauth2(self):
        assert split_camel_case("OAuth2Provider") == ["oauth2", "provider"]

    def test_type_prefix(self):
        assert split_camel_case("typeIgnore") == ["type", "ignore"]

    def test_complex(self):
        assert split_camel_case("migrateEndpointMetaByType") == [
            "migrate", "endpoint", "meta", "by", "type",
        ]


class TestStopWords:
    # tokenization.rs:2803-2810
    def test_programming(self):
        assert is_stop_word("func")
        assert is_stop_word("type")
        assert is_stop_word("struct")
        assert not is_stop_word("migrate")
        assert not is_stop_word("endpoint")

    def test_numbers_0_10(self):
        for n in range(11):
            assert is_stop_word(str(n))
        assert not is_stop_word("11")

    def test_ing(self):
        assert is_stop_word("ing")


class TestTokenize:
    # tokenization.rs:2812-2853 (test_tokenize)
    def test_api_definition(self):
        t = tokenize("func (a *APIDefinition) MigrateEndpointMeta()")
        assert "api" in t
        assert "definit" in t  # stemmed "definition"
        assert "migrat" in t  # stemmed "migrate"
        assert "endpoint" in t or ("end" in t and "point" in t)
        assert "meta" in t

    def test_parse_json(self):
        t = tokenize("func ParseJSONToHTML5()")
        assert "pars" in t
        assert "json" in t
        assert "html" in t
        assert "5" not in t  # numbers 0-10 are stop words

    def test_type_ignore(self):
        t = tokenize("typeIgnore typeWhitelist")
        assert "ignor" in t

    def test_compound_words(self):
        t = tokenize("whitelist blackmail firewall")
        assert "whitelist" in t  # special-case word, not split
        assert "black" in t
        assert "mail" in t
        assert "firewall" in t

    def test_compound_in_camel(self):
        t = tokenize("enableFirewallWhitelist")
        assert "enabl" in t
        assert "firewall" in t
        assert "whitelist" in t

    def test_negated_term_excluded(self):
        t = tokenize("keep -dropped")
        assert "keep" in t
        assert "dropped" not in t and "drop" not in t

    def test_dedup_first_seen(self):
        t = tokenize("cache cache cache miss")
        assert t.count("cach") == 1
        assert "miss" in t

    def test_exception_term_both_forms(self):
        t = tokenize("the middleware")
        # exception terms keep the raw form alongside the stem
        assert "middleware" in t
        assert "middlewar" in t

    def test_stopwords_dropped(self):
        t = tokenize("the quick and the dead")
        assert "the" not in t
        assert "and" not in t
        assert "quick" in t
        assert "dead" in t

    def test_empty(self):
        assert tokenize("") == []
        assert tokenize("   \t\n ") == []

    def test_special_terms_scoped(self):
        base = tokenize("graphqlfoo")
        special = tokenize("graphqlfoo", frozenset(["graphqlfoo"]))
        # with the term registered special, it is kept whole
        assert "graphqlfoo" in special
        # and the default result is unaffected by prior calls (no global leak)
        assert tokenize("graphqlfoo") == base


class TestCompoundSplit:
    # tokenization.rs:2855-2875
    def test_whitelist_not_split(self):
        assert split_compound_word("whitelist") == ["whitelist"]

    def test_blackmail_split(self):
        assert split_compound_word("blackmail") == ["black", "mail"]

    def test_unsplittable(self):
        assert split_compound_word("zzqqxx") == ["zzqqxx"]

    def test_precomputed(self):
        assert split_compound_word("hashmap") == ["hash", "map"]


class TestStemmer:
    def test_reference_pairs(self):
        # pairs implied by reference test expectations (tokenization.rs:2812-2853)
        pairs = {
            "definition": "definit",
            "migrate": "migrat",
            "parse": "pars",
            "ignore": "ignor",
            "enable": "enabl",
            "running": "run",
            "middleware": "middlewar",
            "firewall": "firewal",
            "handling": "handl",
        }
        for w, s in pairs.items():
            assert stem(w) == s, (w, stem(w), s)


class TestRawWords:
    def test_basic(self):
        assert raw_words("Foo bar-baz QUX foo") == ["foo", "bar", "baz", "qux"]


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=200))
def test_tokenize_never_crashes(text):
    out = tokenize(text)
    assert isinstance(out, list)
    assert len(out) == len(set(out))  # always deduplicated


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=100))
def test_tokenize_deterministic(text):
    assert tokenize(text) == tokenize(text)


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=30))
def test_stem_idempotent_on_lowercase(word):
    # stem(stem(w)) == stem(w) is NOT guaranteed by Porter2 in general,
    # but stemming must be deterministic and never crash
    assert stem(word) == stem(word)


class TestTokenizeAndRaw:
    """tokenize_and_raw must equal (tokenize(t), raw_special_words(t))
    exactly — the fused build rides it for every turn."""

    CASES = [
        "Hello world the HashMap getUserName",
        "run --verbose -force foo-bar can't",
        "-excluded word then reuse excluded",
        "- -- -a b",
        "naïve café русский 日本語 mixedASCIIножка",
        "oauth2token setupEnableFirewallWhitelist xxHash64",
        "a.b.c.d x_y_z 0 10 11 12 3.14159",
        "   ",
        "-",
        "repeat repeat REPEAT RePeat",
    ]

    def test_parity_fixed(self):
        from probe_spark.functions.tokenizer import (
            raw_special_words,
            tokenize,
            tokenize_and_raw,
        )

        for t in self.CASES:
            assert tokenize_and_raw(t) == (tokenize(t), raw_special_words(t)), t

    def test_parity_fixture_corpus(self, spark):
        from probe_spark.fixtures import transcripts_df
        from probe_spark.functions.tokenizer import (
            raw_special_words,
            tokenize,
            tokenize_and_raw,
        )

        texts = [
            r["text"]
            for r in transcripts_df(spark, n_convs=300, seed=11).collect()
            if r["text"]
        ]
        assert len(texts) > 1000
        for t in texts:
            assert tokenize_and_raw(t) == (tokenize(t), raw_special_words(t))


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=200))
def test_tokenize_and_raw_parity_property(text):
    from probe_spark.functions.tokenizer import (
        raw_special_words,
        tokenize,
        tokenize_and_raw,
    )

    assert tokenize_and_raw(text) == (tokenize(text), raw_special_words(text))
