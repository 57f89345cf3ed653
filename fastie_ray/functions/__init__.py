from fastie_ray.functions.textnorm import (
    cut_chinese_sent,
    dbc2sbc,
    search,
    space_to_dash,
    unify_prompt_name,
)
from fastie_ray.functions.hashing import stable_hash64, hash_embed

__all__ = [
    "cut_chinese_sent",
    "dbc2sbc",
    "search",
    "space_to_dash",
    "unify_prompt_name",
    "stable_hash64",
    "hash_embed",
]
