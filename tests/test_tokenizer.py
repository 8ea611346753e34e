from oramacore_tpu.types import Locale
from oramacore_tpu.utils.tokenizer import NLPService, TextParser, porter2_stem


def test_porter2_known_vectors():
    cases = {
        "caresses": "caress",
        "flies": "fli",
        "dies": "die",
        "mules": "mule",
        "denied": "deni",
        "died": "die",
        "agreed": "agre",
        "owned": "own",
        "humbled": "humbl",
        "sized": "size",
        "meeting": "meet",
        "stating": "state",
        "itemization": "item",
        "sensational": "sensat",
        "traditional": "tradit",
        "reference": "refer",
        "colonizer": "colon",
        "plotted": "plot",
        "running": "run",
        "games": "game",
        "fantasy": "fantasi",
        "adventure": "adventur",
        "weapons": "weapon",
        "generously": "generous",
        "dying": "die",
        "skies": "sky",
        "news": "news",
        "happy": "happi",
        "happiness": "happi",
        "cats": "cat",
        "christopher": "christoph",
        "table": "tabl",
        "domination": "domin",
    }
    for word, expected in cases.items():
        assert porter2_stem(word) == expected, word


def test_tokenize_and_stem_shape():
    p = TextParser(Locale.EN)
    out = p.tokenize_and_stem("The Foxes are running!")
    tokens = [t for t, _ in out]
    assert tokens == ["the", "foxes", "are", "running"]
    variants = dict(out)
    assert variants["foxes"] == ["fox"]
    assert variants["running"] == ["run"]
    assert variants["the"] == []


def test_tokenizer_keeps_stopwords():
    # reference behavior: stopwords remain searchable
    # (tests/fulltext_search.rs:1107 test_stopwords)
    p = TextParser(Locale.IT)
    out = p.tokenize_and_stem("AI & ChatGPT")
    assert [t for t, _ in out] == ["ai", "chatgpt"]


def test_cjk_tokenization():
    p = TextParser(Locale.ZH)
    toks = p.tokenize("你好世界")
    assert "你" in toks and "你好" in toks and "世界" in toks


def test_nlp_service_caches_parsers():
    svc = NLPService()
    assert svc.get_parser(Locale.EN) is svc.get_parser(Locale.EN)
