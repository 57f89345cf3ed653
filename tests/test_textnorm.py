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


# ------------------------------------------------------------- uie prep


def test_negative_prompts_xor():
    from fastie_ray.functions.uie_prep import negative_prompts

    assert negative_prompts(["A", "B", "C"], ["B"]) == ["A", "C"]
    assert negative_prompts(["A"], ["A"]) == []


def test_sample_negatives_ratio_and_determinism():
    from fastie_ray.functions.uie_prep import sample_negatives

    labels = [f"L{i}" for i in range(20)]
    out1 = sample_negatives("doc text", ["L0"], labels, negative_ratio=3,
                            n_positive_results=2)
    out2 = sample_negatives("doc text", ["L0"], labels, negative_ratio=3,
                            n_positive_results=2)
    assert out1 == out2  # per-key RNG, order-independent
    assert len(out1) == 6  # ratio * n_positive
    assert all(o["prompt"] != "L0" and o["result_list"] == [] for o in out1)
    # ratio -1 keeps all redundants
    out_all = sample_negatives("doc text", ["L0"], labels, -1, 2)
    assert len(out_all) == 19
    # zero positives → ratio-capped at ratio * 1
    out_zero = sample_negatives("doc text", [], labels, 2, 0)
    assert len(out_zero) == 20  # actual_ratio=0 <= 2 → all kept


def test_cls_majority_vote_reference_semantics():
    from fastie_ray.functions.uie_prep import cls_majority_vote

    chunks = [
        [{"text": "pos", "probability": 0.9}],
        [{"text": "neg", "probability": 0.8}],
        [{"text": "pos", "probability": 0.7}],
        [],
    ]
    out = cls_majority_vote(chunks)
    assert out[0]["text"] == "pos"
    assert abs(out[0]["probability"] - 0.8) < 1e-12
    assert cls_majority_vote([[], []]) == []
