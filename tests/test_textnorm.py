from fastie_ray.functions.textnorm import (
    cut_chinese_sent,
    dbc2sbc,
    search,
    space_to_dash,
    unify_prompt_name,
)


def test_cut_chinese_sent_basic():
    assert cut_chinese_sent("今天天气好。明天下雨！后天呢？") == ["今天天气好。", "明天下雨！", "后天呢？"]


def test_cut_chinese_sent_quotes():
    # punctuation inside quotes does not split; the closing-quote rule
    # (reference regex 4) splits after 。” when prose follows
    assert cut_chinese_sent("他说：“走吧。”然后离开了。") == ["他说：“走吧。”", "然后离开了。"]
    # but not when followed by another punctuation mark
    assert cut_chinese_sent("他说：“走吧。”。") == ["他说：“走吧。”。"]


def test_cut_chinese_sent_rstrip():
    assert cut_chinese_sent("abc。  ") == ["abc。"]


def test_cut_chinese_sent_no_punct():
    assert cut_chinese_sent("no punctuation here") == ["no punctuation here"]


def test_dbc2sbc():
    assert dbc2sbc("ＡＢＣ１２３") == "ABC123"
    # reference quirk (uie/decode_utils.py:118-130): U+3000 maps to 0x20,
    # which fails the 0x21..0x7E gate → ideographic space is left as-is
    assert dbc2sbc("　") == "　"
    assert dbc2sbc("中文 unchanged") == "中文 unchanged"


def test_search():
    assert search("bc", "abcd") == 1
    assert search("zz", "abcd") == -1
    assert search("", "abcd") == 0


def test_space_to_dash():
    assert space_to_dash("a b c") == "a-b-c"


def test_unify_prompt_name():
    assert unify_prompt_name("情感[负面,正面]") == "情感[正面,负面]" or unify_prompt_name(
        "情感[负面,正面]"
    ) == "情感[负面,正面]"
    # sorted + dedup semantics
    assert unify_prompt_name("x[b,a,b]") == "x[a,b]"
    assert unify_prompt_name("no options") == "no options"
