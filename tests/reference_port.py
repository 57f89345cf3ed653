"""Line-for-line (torch-free) ports of reference functions, used ONLY as
test oracles — never imported by the engine. Cited per function."""

import math
import re


def ref_cut_chinese_sent(para):
    """global_pointer/decode_utils.py:57-67"""
    para = re.sub(r"([。！？\?])([^”’])", r"\1\n\2", para)
    para = re.sub(r"(\.{6})([^”’])", r"\1\n\2", para)
    para = re.sub(r"(\…{2})([^”’])", r"\1\n\2", para)
    para = re.sub(r"([。！？\?][”’])([^，。！？\?])", r"\1\n\2", para)
    para = para.rstrip()
    return para.split("\n")


def ref_auto_splitter(input_texts, max_text_len, split_sentence=False):
    """global_pointer/decode_utils.py:70-106"""
    input_mapping = {}
    short_input_texts = []
    cnt_short = 0
    for cnt_org, text in enumerate(input_texts):
        sens = ref_cut_chinese_sent(text) if split_sentence else [text]
        for sen in sens:
            lens = len(sen)
            if lens <= max_text_len:
                short_input_texts.append(sen)
                if cnt_org in input_mapping:
                    input_mapping[cnt_org].append(cnt_short)
                else:
                    input_mapping[cnt_org] = [cnt_short]
                cnt_short += 1
            else:
                temp_text_list = [sen[i : i + max_text_len] for i in range(0, lens, max_text_len)]
                short_input_texts.extend(temp_text_list)
                short_idx = cnt_short
                cnt_short += math.ceil(lens / max_text_len)
                temp_text_id = [short_idx + i for i in range(cnt_short - short_idx)]
                if cnt_org in input_mapping:
                    input_mapping[cnt_org].extend(temp_text_id)
                else:
                    input_mapping[cnt_org] = temp_text_id
    return short_input_texts, input_mapping


def ref_auto_joiner_ner(short_results, short_inputs, input_mapping):
    """NerDecoder._auto_joiner, global_pointer/decode_utils.py:208-229
    (returns the raw per-doc sets, before set2json)."""
    concat_results = []
    for k, vs in input_mapping.items():
        single_results = set()
        offset = 0
        for i, v in enumerate(vs):
            if i == 0:
                single_results = set(short_results[v])
            else:
                for res in short_results[v]:
                    tmp = res[0], res[1] + offset, res[2] + offset, res[3]
                    single_results.add(tmp)
            offset += len(short_inputs[v])
        concat_results.append(single_results)
    return concat_results


def ref_auto_joiner_rel(short_results, input_mapping):
    """RelExtractionDecoder._auto_joiner (plain set union; raw sets,
    before set2json), relation_extraction/gplinker/decode_utils.py:190-201."""
    concat_results = []
    for k, vs in input_mapping.items():
        group_results = [short_results[v] for v in vs if len(short_results[v]) > 0]
        single_results = set.union(*group_results) if group_results else set()
        concat_results.append(single_results)
    return concat_results


# ---- reference-style predict loops (single process, micro-batch) ----
# These mirror NerDecoder.predict (global_pointer/decode_utils.py:119-158)
# and RelExtractionDecoder.predict (gplinker/decode_utils.py:124-163),
# using the deterministic featurizer's DENSE logits + the dense decode
# kernels in place of the transformer forward pass.


def ref_predict_ner(texts, world, max_length=512, split_sentence=False):
    from fastie_ray.featurizer import GazetteerFeaturizer
    from fastie_ray.kernels.gp_ner import decode_gp_dense
    from fastie_ray.tokenizer import CharTokenizer

    feat = GazetteerFeaturizer(world)
    tok = CharTokenizer(max_length)
    short, mapping = ref_auto_splitter(texts, max_length - 2, split_sentence)
    infer = [t.replace(" ", "-") for t in short]
    outputs = []
    for text, dashed in zip(short, infer):
        logits = feat.ner_logits_dense(dashed, max_length)
        outputs.append(
            decode_gp_dense(
                logits, tok.seq_len(text), text, tok.offset_mapping(text), feat.id2label
            )
        )
    return ref_auto_joiner_ner(outputs, short, mapping)


def ref_predict_rel(texts, world, max_length=512, split_sentence=False):
    from fastie_ray.featurizer import GazetteerFeaturizer
    from fastie_ray.kernels.gplinker_re import decode_gplinker_dense
    from fastie_ray.tokenizer import CharTokenizer

    feat = GazetteerFeaturizer(world)
    tok = CharTokenizer(max_length)
    short, mapping = ref_auto_splitter(texts, max_length - 2, split_sentence)
    infer = [t.replace(" ", "-") for t in short]
    outputs = []
    for text, dashed in zip(short, infer):
        entity, head, tail = feat.rel_logits_dense(dashed, max_length)
        outputs.append(
            decode_gplinker_dense(
                entity, head, tail, tok.seq_len(text), text,
                tok.offset_mapping(text), feat.id2predicate,
            )
        )
    return ref_auto_joiner_rel(outputs, mapping)


def ref_auto_joiner_cls(short_results, input_mapping):
    """UIEDecoder._auto_joiner classification arm, line-for-line from
    fastie/models/uie/decode_utils.py:484-507 (is_cls_task branch)."""
    concat_results = []
    for k, vs in input_mapping.items():
        cls_options = {}
        for v in vs:
            if len(short_results[v]) == 0:
                continue
            if short_results[v][0]["text"] in cls_options:
                cls_options[short_results[v][0]["text"]][0] += 1
                cls_options[short_results[v][0]["text"]][1] += short_results[v][0][
                    "probability"
                ]
            else:
                cls_options[short_results[v][0]["text"]] = [
                    1,
                    short_results[v][0]["probability"],
                ]
        if cls_options:
            cls_res, cls_info = max(cls_options.items(), key=lambda x: x[1])
            concat_results.append(
                [{"text": cls_res, "probability": cls_info[1] / cls_info[0]}]
            )
        else:
            concat_results.append([])
    return concat_results


# ---- data-converter ports (golden conformance on the REAL dev corpora) ----


def ref_search(pattern, sequence):
    """fastie/data/relation_extraction.py:25-29"""
    return next(
        (i for i in range(len(sequence))
         if sequence[i: i + len(pattern)] == pattern), -1
    )


def ref_process_rel_train(examples, predicate2id):
    """process_train's judge + convert (relation_extraction.py:32-66)
    over plain dict rows (the HF Dataset.filter().map() loop inlined)."""
    out = []
    for example in examples:
        spo_list = []
        for spo in example["spo_list"]:
            sub = ref_search(spo["subject"], example["text"])
            pre = predicate2id[spo["predicate"]]
            obj = ref_search(spo["object"], example["text"])
            if sub == -1 or obj == -1:
                continue
            spo_list.append(
                [sub, sub + len(spo["subject"]) - 1, pre,
                 obj, obj + len(spo["object"]) - 1]
            )
        if spo_list:  # judge
            out.append({"text": example["text"], "spo_list": spo_list})
    return out


def ref_ner_process_dev(example):
    """named_entity_recognition.py:82-95 (with_indices=False branch)."""
    return {
        (ent["label"], str(ent["start_offset"]), str(ent["end_offset"]),
         ent["entity"])
        for ent in example["entities"]
    }


def ref_duee_v1_process(example):
    """event_extraction.py:71-98 — per-event target lists with the
    lstrip offset correction."""
    events = []
    for e in example["event_list"]:
        offset1 = len(e["trigger"]) - len(e["trigger"].lstrip())
        events.append(
            [[e["event_type"], "触发词", e["trigger"],
              str(e["trigger_start_index"] + offset1),
              str(e["trigger_start_index"] + offset1
                  + len(e["trigger"].strip()))]]
        )
        for a in e["arguments"]:
            offset2 = len(a["argument"]) - len(a["argument"].lstrip())
            events[-1].append(
                [e["event_type"], a["role"], a["argument"],
                 str(a["argument_start_index"] + offset2),
                 str(a["argument_start_index"] + offset2
                     + len(a["argument"].strip()))]
            )
    return events


def ref_ee_schema_labels(schema_file):
    """event_extraction.py:42-50 — schema JSONL → sorted flat labels."""
    import json

    labels = []
    with open(schema_file) as f:
        for l in f:
            l = json.loads(l)
            t = l["event_type"]
            for r in ["触发词"] + [s["role"] for s in l["role_list"]]:
                labels.append(f"{t}@{r}")
    return sorted(labels)


def ref_ner_label_vocab(examples):
    """named_entity_recognition.py:60-62 — distinct labels, sorted."""
    return sorted(
        {label["label"] for ex in examples for label in ex["entities"]}
    )
