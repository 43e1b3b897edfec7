"""Aho-Corasick linker core: greedy longest-match semantics.

The automaton (stages/linker.py `_TokenAC`) must reproduce exactly the
reference-derived matching contract: at each token position take the
longest label starting there, consume its tokens, never re-match
inside a consumed window (ref analogue: the exact-string label memo,
skos_converter.py:70).
"""

from __future__ import annotations

from skosconverter_ray.stages.linker import LinkerStage


def _matches(index: dict, text: str):
    st = LinkerStage(index)
    st._resolve()
    return st._match_span(text)


def test_longest_match_wins():
    idx = {"new york": ("uri:ny", "pref"), "new york city": ("uri:nyc", "pref")}
    assert _matches(idx, "in New   York City today") == [
        ("new york city", "uri:nyc", "pref")
    ]
    # shorter label still matches when the longer one can't complete
    assert _matches(idx, "in new york today") == [
        ("new york", "uri:ny", "pref")
    ]


def test_consumed_tokens_not_rematched():
    idx = {"a b": ("uri:ab", "pref"), "b c": ("uri:bc", "pref")}
    assert _matches(idx, "a b c") == [("a b", "uri:ab", "pref")]


def test_fail_link_suffix_match():
    # 'a b x' never completes, but its suffix 'b' is a label reached
    # via the fail transition mid-path
    idx = {"a b x": ("uri:abx", "pref"), "b": ("uri:b", "alt")}
    assert _matches(idx, "a b c") == [("b", "uri:b", "alt")]


def test_adjacent_and_repeated_matches():
    idx = {"x y": ("uri:xy", "pref"), "z": ("uri:z", "hidden")}
    assert _matches(idx, "x y z x y") == [
        ("x y", "uri:xy", "pref"),
        ("z", "uri:z", "hidden"),
        ("x y", "uri:xy", "pref"),
    ]


def test_empty_and_no_match():
    idx = {"q": ("uri:q", "pref")}
    assert _matches(idx, "") == []
    assert _matches(idx, "   ") == []
    assert _matches(idx, "nothing here") == []


def test_normalization_applied():
    idx = {"big apple": ("uri:ba", "pref")}
    assert _matches(idx, "  BIG\t\tApple  ") == [("big apple", "uri:ba", "pref")]
