"""Synthetic multi-turn transcript tables (the engine's primary input).

Schema is exactly BASELINE.json's input_hint:
  conv_id:string, turn_idx:int32, role:string, text:string,
  tool:string, ts:timestamp[us]

The generator is fully deterministic (seeded numpy Generator) and
emits the FIXTURES.md edge cases: stopword-only turns, a turn repeating
one token many times (maxFreq path), duplicate text across turns,
single-turn conversations, adjacent tokens forming the same sorted pair
twice in one window, and a token present in >50% of turns
(negative-IDF truncation path, utilsClass.java:122,127-129).

Rows are written SHUFFLED across several files so stable doc-id
assignment by (conv_id, turn_idx) rank is actually exercised.
"""

from __future__ import annotations

import datetime as _dt
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ROLES = ["user", "assistant", "system", "tool"]

def _vocab() -> list[str]:
    """~1.5k-word vocabulary; sampled with Zipf-ish skew (a hot head of
    ~200 terms, a long synthetic tail so dictionary/df/pair key spaces
    behave realistically)."""
    stems = [
        "agent", "batch", "cache", "data", "error", "file", "graph", "host",
        "index", "job", "kernel", "latency", "model", "node", "object",
        "plan", "query", "ray", "shard", "token", "user", "vector", "worker",
        "actor", "block", "cluster", "dataset", "engine", "frame", "group",
    ]
    vocab = []
    for s in stems:
        vocab.append(s)
        for k in range(6):
            vocab.append(f"{s}ing" if k == 0 else f"{s}{'er s ed ly ment'.split()[k-1]}")
    # pure-numeric tokens (kept by the tokenizer) and some rare terms
    vocab += [str(1000 + i) for i in range(20)]
    vocab += [f"rareterm{chr(ord('a') + i)}" for i in range(20)]
    # long tail: deterministic synthetic terms (Zipf weights put these
    # in the low-frequency regime; many occur in only a handful of turns)
    pre = ["sys", "net", "mem", "disk", "log", "api", "rpc", "gpu"]
    suf = ["alloc", "trace", "fault", "probe", "stat", "conf", "meta",
           "pool", "lock", "span", "tick", "hook", "gauge", "quota",
           "shim", "queue", "edge", "leaf", "root", "path"]
    for p in pre:
        for s in suf:
            for k in range(8):
                # pure-alpha variants (mixed alnum would be dropped by
                # the tokenizer's keep-filter)
                vocab.append(f"{p}{s}" if k == 0 else f"{p}{s}{chr(ord('a') + k)}")
    # dedupe preserving order
    seen, out = set(), []
    for w in vocab:
        if w not in seen:
            seen.add(w)
            out.append(w)
    return out


def generate_transcripts(num_convs: int, seed: int = 42) -> pa.Table:
    rng = np.random.default_rng(seed)
    vocab = np.array(_vocab())
    v = len(vocab)
    # Zipf-like weights over the vocab
    weights = 1.0 / np.arange(1, v + 1) ** 1.1
    weights /= weights.sum()
    noise = ["the", "and", "of", "a", "to", "x", "y", "9", "!!", "mix3d",
             "a1b2", "...", "??", "-", "it's"]

    conv_ids, turn_idxs, roles, texts, tools, tss = [], [], [], [], [], []
    base_ts = _dt.datetime(2024, 1, 1)
    for c in range(num_convs):
        conv = f"conv{c:06d}"
        # single-turn conversation edge case every 37th conv
        n_turns = 1 if c % 37 == 5 else int(rng.integers(2, 13))
        t_cursor = base_ts + _dt.timedelta(seconds=int(rng.integers(0, 10_000_000)))
        for t in range(n_turns):
            role = ROLES[int(rng.integers(0, 4))]
            if c % 23 == 3 and t == 0:
                # stopword/punct-only turn (empty after tokenization)
                text = "the and of ... to a !! -"
            elif c % 29 == 7 and t == 0:
                # one token repeated many times (maxFreq path)
                text = " ".join(["query"] * int(rng.integers(20, 60)))
            elif c % 31 == 11 and t == 0:
                # duplicate text across different turns (doc-scoped dedup)
                text = "duplicate payload text shard index worker"
            elif c % 19 == 2 and t == 0:
                # same sorted pair twice inside one window
                text = "alpha beta alpha beta gamma"
            else:
                n_words = int(rng.integers(8, 121))
                words = list(rng.choice(vocab, size=n_words, p=weights))
                # hot term in >50% of turns → negative IDF path
                if rng.random() < 0.7:
                    words.insert(int(rng.integers(0, len(words) + 1)), "data")
                # sprinkle noise tokens
                for _ in range(int(rng.integers(0, 5))):
                    words.insert(int(rng.integers(0, len(words) + 1)),
                                 noise[int(rng.integers(0, len(noise)))])
                # occasional uppercase
                if rng.random() < 0.3:
                    i = int(rng.integers(0, len(words)))
                    words[i] = words[i].upper()
                text = " ".join(words)
            conv_ids.append(conv)
            turn_idxs.append(t)
            roles.append(role)
            texts.append(text)
            tools.append(f"tool{int(rng.integers(0, 5))}" if role == "tool" else "")
            t_cursor += _dt.timedelta(seconds=int(rng.integers(1, 120)))
            tss.append(t_cursor)

    table = pa.table({
        "conv_id": pa.array(conv_ids, pa.string()),
        "turn_idx": pa.array(turn_idxs, pa.int32()),
        "role": pa.array(roles, pa.string()),
        "text": pa.array(texts, pa.string()),
        "tool": pa.array(tools, pa.string()),
        "ts": pa.array(tss, pa.timestamp("us")),
    })
    # deterministic shuffle so on-disk order != (conv_id, turn_idx) order
    perm = np.random.default_rng(seed + 1).permutation(table.num_rows)
    return table.take(pa.array(perm))


def write_transcripts(dir_path: str, num_convs: int, seed: int = 42,
                      num_files: int = 4) -> str:
    """Write the shuffled table across `num_files` parquet files."""
    os.makedirs(dir_path, exist_ok=True)
    table = generate_transcripts(num_convs, seed)
    n = table.num_rows
    bounds = np.linspace(0, n, num_files + 1).astype(int)
    for i in range(num_files):
        pq.write_table(table.slice(bounds[i], bounds[i + 1] - bounds[i]),
                       os.path.join(dir_path, f"transcripts_{i:03d}.parquet"),
                       row_group_size=max(256, n // (num_files * 4)))
    return dir_path
