"""Host-side tokenization feeding fixed-shape padded batches.

XLA wants static shapes: sequence lengths round up to a small set of
buckets so the jitted encoder compiles once per bucket, not per batch.

Two tokenizer families:

* HFTokenizer — wraps a local HuggingFace `tokenizers` file / directory
  (tokenizer.json or vocab files). Used when real model checkpoints with
  their vocabularies are available on disk (this environment has no
  network egress, so nothing is downloaded).
* HashTokenizer — a deterministic hashing tokenizer (whitespace words ->
  stable ids). It makes the whole pipeline runnable self-contained:
  structurally identical batches, real vocabulary distribution, just not
  pretrained-aligned. Training/benchmark paths use it by default.
"""
from __future__ import annotations

import hashlib
from typing import List, Optional, Sequence, Tuple

import numpy as np

DEFAULT_BUCKETS = (16, 32, 64, 128, 256)


def bucket_length(n: int, buckets: Sequence[int] = DEFAULT_BUCKETS) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


class TokenizerBase:
    pad_id: int = 0

    def encode_batch(
        self, texts: Sequence[str], max_len: int = 256
    ) -> Tuple[np.ndarray, np.ndarray]:
        """-> (input_ids, attention_mask), both (B, L) with L bucketed."""
        raise NotImplementedError


class HashTokenizer(TokenizerBase):
    """Deterministic word-hash tokenizer: pad=0, cls=1, sep=2, unk=3."""

    pad_id = 0
    cls_id = 1
    sep_id = 2

    def __init__(self, vocab_size: int = 250002, add_special: bool = True):
        self.vocab_size = vocab_size
        self.add_special = add_special
        self._n_special = 4

    def _word_id(self, word: str) -> int:
        digest = hashlib.md5(word.encode("utf-8")).digest()
        value = int.from_bytes(digest[:8], "little")
        return self._n_special + value % (self.vocab_size - self._n_special)

    def encode(self, text: str, max_len: int = 256) -> List[int]:
        words = text.split()
        budget = max_len - (2 if self.add_special else 0)
        ids = [self._word_id(w) for w in words[:budget]]
        if self.add_special:
            ids = [self.cls_id] + ids + [self.sep_id]
        return ids

    def encode_batch(
        self, texts: Sequence[str], max_len: int = 256
    ) -> Tuple[np.ndarray, np.ndarray]:
        encoded = [self.encode(t, max_len) for t in texts]
        longest = max((len(e) for e in encoded), default=1)
        length = bucket_length(min(longest, max_len))
        ids = np.full((len(texts), length), self.pad_id, np.int32)
        mask = np.zeros((len(texts), length), np.int32)
        for i, e in enumerate(encoded):
            e = e[:length]
            ids[i, : len(e)] = e
            mask[i, : len(e)] = 1
        return ids, mask


class HFTokenizer(TokenizerBase):
    """Local HuggingFace tokenizer (tokenizers-lib Tokenizer or a
    transformers AutoTokenizer loaded from a local directory)."""

    def __init__(self, path: str, pad_id: Optional[int] = None):
        import os

        tok_json = (
            path if path.endswith(".json") else os.path.join(path, "tokenizer.json")
        )
        if os.path.exists(tok_json):
            from tokenizers import Tokenizer

            self._tok = Tokenizer.from_file(tok_json)
            self._mode = "tokenizers"
            pad_token_id = self._tok.token_to_id("<pad>")
            if pad_token_id is None:
                pad_token_id = self._tok.token_to_id("[PAD]") or 0
        else:
            from transformers import AutoTokenizer

            self._tok = AutoTokenizer.from_pretrained(path, local_files_only=True)
            self._mode = "transformers"
            pad_token_id = self._tok.pad_token_id or 0
        self.pad_id = pad_id if pad_id is not None else pad_token_id
        # generation contract (TextGenerator / LocalGenerationServer call
        # encode/decode/eos_id on the generator's tokenizer)
        if self._mode == "transformers":
            self.bos_id = (
                -1 if self._tok.bos_token_id is None else self._tok.bos_token_id
            )
            self.eos_id = (
                -1 if self._tok.eos_token_id is None else self._tok.eos_token_id
            )
        else:
            self.bos_id = self._first_id(
                "<|begin_of_text|>", "<s>", "<bos>", "[CLS]"
            )
            self.eos_id = self._first_id(
                "<|eot_id|>", "<|end_of_text|>", "</s>", "<eos>", "[SEP]"
            )

    def _first_id(self, *candidates: str) -> int:
        for token in candidates:
            tid = self._tok.token_to_id(token)
            if tid is not None:
                return tid
        return -1  # "never matches": the decode loop compares token != eos

    def encode(self, text: str, add_bos: bool = True) -> List[int]:
        """Generation-side single-text encode (List[int], BOS prepended
        when the vocabulary has one)."""
        if self._mode == "transformers":
            return list(self._tok(text)["input_ids"])
        ids = self._tok.encode(text, add_special_tokens=False).ids
        if add_bos and self.bos_id >= 0:
            ids = [self.bos_id] + ids
        return list(ids)

    def decode(self, ids: Sequence[int]) -> str:
        keep = [int(i) for i in ids]
        if self._mode == "transformers":
            return self._tok.decode(keep, skip_special_tokens=True)
        return self._tok.decode(keep, skip_special_tokens=True)

    def encode_batch(
        self, texts: Sequence[str], max_len: int = 256
    ) -> Tuple[np.ndarray, np.ndarray]:
        if self._mode == "tokenizers":
            encs = self._tok.encode_batch(list(texts))
            seqs = [e.ids[:max_len] for e in encs]
        else:
            out = self._tok(list(texts), truncation=True, max_length=max_len)
            seqs = out["input_ids"]
        longest = max((len(s) for s in seqs), default=1)
        length = bucket_length(min(longest, max_len))
        ids = np.full((len(texts), length), self.pad_id, np.int32)
        mask = np.zeros((len(texts), length), np.int32)
        for i, s in enumerate(seqs):
            s = s[:length]
            ids[i, : len(s)] = s
            mask[i, : len(s)] = 1
        return ids, mask
