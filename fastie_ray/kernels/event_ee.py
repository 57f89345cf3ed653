"""GPLinker event-extraction decode (reference semantics, torch-free).

Reference:

- ``DedupList`` / ``isin`` / ``neighbors`` / ``clique_search``:
  ``fastie/models/event_extraction/gplinker/decode_utils.py:18-62``;
- grid decode (argument extraction, link building, complete-subgraph
  event grouping, trigger filter):
  ``fastie/models/event_extraction/gplinker/modeling_gplinker.py:157-221``;
- ``set2json`` event projection with subset dedup:
  ``decode_utils.py:76-100``.

The argument labels are flat ``f"{event_type}@{role}"`` strings
(``fastie/data/event_extraction.py:42-50``) split on ``@`` during
decode; a synthetic ``触发词`` (trigger) role marks the trigger and
trigger-less cliques are dropped when ``has_trigger``.
"""

from __future__ import annotations

from itertools import groupby
from typing import Iterable

import numpy as np

TRIGGER_ROLE = "触发词"


class DedupList(list):
    """Order-preserving list that skips duplicates on append
    (``decode_utils.py:18-22``)."""

    def append(self, x):  # noqa: A003 - reference name
        if x not in self:
            super().append(x)


def isin(event_a: dict, event_b: dict) -> bool:
    """Is event_a a subset of event_b (``decode_utils.py:25-32``)."""
    if event_a["event_type"] != event_b["event_type"]:
        return False
    for argu in event_a["arguments"]:
        if argu not in event_b["arguments"]:
            return False
    return True


def neighbors(host, argus, links):
    """Host node plus all linked neighbours (``decode_utils.py:35-41``)."""
    results = [host]
    for argu in argus:
        if host[2:] + argu[2:] in links:
            results.append(argu)
    return list(sorted(results))


def clique_search(argus, links):
    """Split an argument set into complete subgraphs (independent
    events) — ``decode_utils.py:44-62``."""
    Argus = DedupList()
    for i1, (_, _, h1, t1) in enumerate(argus):
        for i2, (_, _, h2, t2) in enumerate(argus):
            if i2 > i1:
                if (h1, t1, h2, t2) not in links:
                    Argus.append(neighbors(argus[i1], argus, links))
                    Argus.append(neighbors(argus[i2], argus, links))
    if Argus:
        results = DedupList()
        for A in Argus:
            for a in clique_search(A, links):
                results.append(a)
        return results
    return [list(sorted(argus))]


def decode_event_dense(
    argu_logits: np.ndarray,  # [num_labels, L, L]
    head_logits: np.ndarray,  # [1, L, L]
    tail_logits: np.ndarray,  # [1, L, L]
    seq_len: int,
    text: str,
    offset_mapping,
    id2predicate: dict[int, str],
    decode_thresh: float = 0.0,
    split: str = "@",
    has_trigger: bool = True,
) -> list[list[tuple[str, str, str, int, int]]]:
    """Line-for-line port of ``modeling_gplinker.py:176-218``: returns a
    list of events, each a list of ``(event_type, role, argument_text,
    char_start, char_end)`` tuples."""
    argus = set()
    for p, h, t in zip(*np.where(argu_logits > decode_thresh)):
        p, h, t = int(p), int(h), int(t)
        if h >= (seq_len - 1) or t >= (seq_len - 1) or 0 in [h, t]:
            continue
        parts = id2predicate[p].rsplit(split, 1)
        argus.add((*parts, h, t))

    links = set()
    for i1, (_, _, h1, t1) in enumerate(argus):
        for i2, (_, _, h2, t2) in enumerate(argus):
            if i2 > i1:
                if (
                    head_logits[0, min(h1, h2), max(h1, h2)] > decode_thresh
                    and tail_logits[0, min(t1, t2), max(t1, t2)] > decode_thresh
                ):
                    links.add((h1, t1, h2, t2))
                    links.add((h2, t2, h1, t1))

    return _events_from_argus(
        argus, links, text, offset_mapping, has_trigger=has_trigger
    )


def decode_event_sparse(
    argu_hits: Iterable[tuple[str, str, int, int]],  # (event_type, role, head, tail)
    link_pairs: Iterable[tuple[int, int, int, int]],  # symmetric (h1,t1,h2,t2)
    seq_len: int,
    text: str,
    offset_mapping,
    has_trigger: bool = True,
) -> list[list[tuple[str, str, str, int, int]]]:
    """Production path over sparse hits; the link set must already be
    symmetric (both orientations present), as the dense port builds it."""
    argus = {
        (et, role, h, t)
        for et, role, h, t in argu_hits
        if not (h >= (seq_len - 1) or t >= (seq_len - 1) or 0 in [h, t])
    }
    links = set(link_pairs)
    return _events_from_argus(
        argus, links, text, offset_mapping, has_trigger=has_trigger
    )


def _events_from_argus(argus, links, text, offset_mapping, has_trigger: bool):
    events: list[list[tuple[str, str, str, int, int]]] = []
    for _, sub_argus in groupby(sorted(argus), key=lambda s: s[0]):
        for event in clique_search(list(sub_argus), links):
            events.append([])
            for argu in event:
                start, end = offset_mapping[argu[2]][0], offset_mapping[argu[3]][1]
                events[-1].append((argu[0], argu[1], text[start:end], start, end))
            if has_trigger and all(argu[1] != TRIGGER_ROLE for argu in event):
                events.pop()
    return events


def events_to_json(events) -> list[dict]:
    """``set2json`` with subset dedup (``decode_utils.py:76-100``)."""
    event_list = DedupList()
    for event in events:
        final_event = {"event_type": event[0][0], "arguments": DedupList()}
        for argu in event:
            role = argu[1]
            if role != TRIGGER_ROLE:
                final_event["arguments"].append(
                    {"role": role, "argument": argu[2]}
                )
            else:
                final_event["trigger"] = argu[2]
        event_list = [ev for ev in event_list if not isin(ev, final_event)]
        if not any(isin(final_event, ev) for ev in event_list):
            event_list.append(final_event)
    return event_list
