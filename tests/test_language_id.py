"""Language-ID heuristic: marker-word routing for Latin-script
languages and script-character routing for non-Latin scripts."""

from zentity_spark.extras import language_id


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r["pred_lang"] for r in language_id(df).collect()}


def test_language_vectors(spark):
    out = _run(spark, [
        (1, "the cat and the dog is of note"),
        (2, "der hund und das pferd ist gut"),
        (3, "le chat et la maison est grande"),
        (4, "el perro y la casa es grande"),
        (5, "il gatto che corre di qua per la strada"),
        (6, "och det var en dag att minnas är bra"),
        (7, "bir şey ve bu ev için güzel"),
        (8, "yang penting dan baik di sini untuk kita"),
        (9, "xyzzy plugh 12345"),  # no markers → unknown
    ])
    assert out[1] == "en"
    assert out[2] == "de"
    assert out[3] == "fr"
    assert out[4] == "es"
    assert out[5] == "it"
    assert out[6] == "sv"
    assert out[7] == "tr"
    assert out[8] == "id"
    assert out[9] == "unknown"


def test_script_vectors(spark):
    out = _run(spark, [
        (1, "Привет мир, как дела сегодня"),           # Cyrillic → ru
        (2, "مرحبا بالعالم كيف حالك"),                  # Arabic → ar
        (3, "שלום עולם מה שלומך"),                      # Hebrew → he
        (4, "Γειά σου κόσμε τι κάνεις"),                # Greek → el
        (5, "नमस्ते दुनिया कैसे हो"),                      # Devanagari → hi
        (6, "สวัสดีชาวโลกเป็นอย่างไรบ้าง"),                  # Thai → th
        (7, "안녕하세요 세계 여러분"),                   # Hangul → ko
        (8, "こんにちは世界のみなさん"),                # kana present → ja
        (9, "你好世界欢迎大家光临"),                    # Han only → zh
        # a couple of native words outvote surrounding Latin markup
        (10, "<p>Новости дня</p> the page is of note and the rest"),
    ])
    assert out[1] == "ru"
    assert out[2] == "ar"
    assert out[3] == "he"
    assert out[4] == "el"
    assert out[5] == "hi"
    assert out[6] == "th"
    assert out[7] == "ko"
    assert out[8] == "ja"
    assert out[9] == "zh"
    assert out[10] == "ru"
