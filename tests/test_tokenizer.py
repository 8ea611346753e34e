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


def test_light_stemmers_cover_reference_locales():
    """Inflected/base pairs stem to the same form per locale (SURVEY
    §2.7: reference stems ~30 locales via oramacore_lib::nlp)."""
    from oramacore_tpu.types import Locale
    from oramacore_tpu.utils.tokenizer import TextParser

    CASES = {
        "dutch": [("huizen", "huis", False), ("lopen", "loop", False),
                  ("boeken", "boek", True)],
        "swedish": [("flickorna", "flickor", True), ("husen", "hus", True),  # Snowball keeps definite-sg "huset"
                    ("bilarna", "bil", True)],
        "danish": [("husene", "hus", True), ("bilerne", "biler", True)],
        "norwegian": [("bilene", "bil", True), ("husets", "huset", True)],
        "finnish": [("talossa", "talo", True), ("kirjat", "kirja", True)],
        "hungarian": [("házban", "ház", True), ("könyvek", "könyv", True)],
        "estonian": [("majadele", "maja", True), ("raamatud", "raamatu", True)],
        "turkish": [("evlerde", "ev", True), ("kitaplar", "kitap", True)],
        "russian": [("книгами", "книга", True), ("домов", "дом", True),
                    ("красная", "красный", True)],
        "ukrainian": [("книгами", "книга", True), ("будинків", "будинк", True)],
        "bulgarian": [("книгите", "книги", True), ("градът", "град", True)],
        "lithuanian": [("namuose", "namas", True), ("knygos", "knyga", True)],
        "serbian": [("knjigama", "knjiga", True), ("gradovima", "grad", True)],
        "greek": [("βιβλία", "βιβλίο", True), ("δρόμος", "δρόμοι", True)],
        "romanian": [("cărțile", "cărți", True), ("orașului", "oraș", True)],
        "hindi": [("किताबों", "किताब", True), ("लड़कियों", "लड़की", False)],
        "arabic": [("الكتاب", "كتاب", True), ("مدرسات", "مدرس", True)],
        "indonesian": [("makanannya", "makan", True),
                       ("membaca", "baca", False)],
    }
    failures = []
    for locale_name, pairs in CASES.items():
        parser = TextParser(Locale.parse(locale_name))
        for a, b, must in pairs:
            sa, sb = parser.stem(a), parser.stem(b)
            if sa != sb:
                if must:
                    failures.append((locale_name, a, b, sa, sb))
    assert not failures, failures


def test_stemmed_search_in_new_locales():
    """Engine-level: a Russian collection matches inflected forms."""
    from .utils import TestContext

    ctx = TestContext()
    try:
        coll = ctx.create_collection(language="russian")
        idx = coll.create_index()
        idx.insert_documents([
            {"id": "1", "t": "красная книга о животных"},
            {"id": "2", "t": "синий дом у моря"},
        ])
        out = coll.search({"term": "книгами"})  # instrumental plural
        assert out.count >= 1
        assert out.hits[0].id.endswith(":1")
        out = coll.search({"term": "красный"})
        assert out.count >= 1 and out.hits[0].id.endswith(":1")
    finally:
        ctx.close()


def test_snowball_stemmers_active_for_major_locales():
    """Locales with a full Snowball implementation use it (the same
    algorithm family the reference gets from rust-stemmers); light
    suffix-strippers remain the fallback for the rest."""
    from oramacore_tpu.utils.tokenizer import TextParser
    from oramacore_tpu.types import Locale

    fr = TextParser(Locale.FR)
    assert fr._snowball is not None
    # genuine Snowball French behaviors a light stripper can't do:
    # -aient verb ending and -ité noun suffix reduction
    assert fr.stem("mangeaient") == fr.stem("manger")[:4] or \
        fr.stem("mangeaient") == "mang"
    assert fr.stem("nationalité") == fr.stem("national")

    de = TextParser(Locale.DE)
    assert de.stem("häuser") == de.stem("häusern")
    ru = TextParser(Locale.RU)
    assert ru.stem("книгами") == ru.stem("книга")
    # unsupported locales keep the light stemmer (no crash, no snowball)
    et = TextParser(Locale.ET)
    assert et._snowball is None
    assert et.stem("majadele") == et.stem("maja")
