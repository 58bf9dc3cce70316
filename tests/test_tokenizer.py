"""Tokenizer/stemmer/transliterator goldens from the reference's own tests
(yupana-utils/src/test: RussianTokenizerTest, RussianTransliteratorTest)."""

import pytest

from yupana_spark.functions.tokenizer import (stem_ru, stemmed_tokens,
                                              transliterate)


def same_elements(got, expected):
    assert sorted(got) == sorted(expected), f"{got} vs {expected}"


def test_numbers_and_words_split():
    # RussianTokenizerTest "split numbers and words"
    same_elements(stemmed_tokens("95пульсар"), ["95пульсар", "95", "пульсар"])
    same_elements(stemmed_tokens("аи95пульсар"),
                  ["аи95пульсар", "аи", "95", "пульсар"])
    same_elements(stemmed_tokens("аи95"), ["аи95", "аи", "95"])


def test_complex_item_line():
    toks = stemmed_tokens("трк 1 (atum-92-к5) 1.256281 x 39.80")
    same_elements(toks, ["трк", "1", "atum", "92", "к", "5", "к5",
                         "1.256281", "x", "39.80"])


def test_slash_tokens_kept():
    assert "ж/р" in stemmed_tokens(" лаки дейз ж/р арбуз подушечки 14г (c")
    assert "и/о" in stemmed_tokens("мясн/пр сос.классич с сливк. и/о вар 0,4кг пл/у(аг")


def test_ai_preserved():
    same_elements(stemmed_tokens("аи"), ["аи"])
    same_elements(stemmed_tokens("аи-95"), ["аи", "95"])
    same_elements(stemmed_tokens("бензин аи95 n 3"),
                  ["бензин", "аи", "95", "аи95", "n", "3"])
    same_elements(stemmed_tokens("95аи"), ["аи", "95", "95а"])


def test_stemmer_goldens():
    # "95аи" -> removeCase strips the single final vowel
    assert stem_ru("95аи") == "95а"
    assert stem_ru("пульсар") == "пульсар"
    assert stem_ru("подушечки") == "подушечк"


def test_transliterator_goldens():
    # RussianTransliteratorTest table
    assert transliterate("черный плащ") == "chernyj plashch"
    assert transliterate("щупальца южных ёжиков") == "shchupalca yuzhnyh ezhikov"
    assert transliterate("Ядерный Грибок") == "YAdernyj Gribok"
    assert transliterate("ОБЪЕДЕННЫЙ КРЕНДЕЛЬ") == "OBEDENNYJ KRENDEL"


def test_ofd_item_fixer_goldens():
    # OfdItemFixerTest table
    from yupana_spark.functions.itemfixer import ofd_item_fixer

    cases = [
        ("гуляш соевый 50% ┬лсойка┬╗, 500г (россия) шт",
         'гуляш соевый 50% "сойка", 500г (россия) шт'),
        ("семечки крупные ╣1", "семечки крупные №1"),
        ("г╕ссер 0.3 мл в розлив", "гёссер 0.3 мл в розлив"),
    ]
    for broken, fixed in cases:
        assert ofd_item_fixer(broken) == fixed
