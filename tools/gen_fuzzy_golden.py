"""Generate tests/golden/fuzzy_golden.csv from the independent slow reference
kernels (tests/fuzzy_reference.py).

Deterministic (seeded) pair set covering the shapes that exercise every code
path of the fast kernels: random word phrases, unicode, empties, single chars,
substring containment, full-window ties, BOUNDARY-WINDOW adversarials (the
needle overhanging either end of the haystack — the rapidfuzz semantics the
first-round kernels missed), >63-char strings (scalar fallback path), and the
public rapidfuzz documentation examples.

Run: python tools/gen_fuzzy_golden.py   (rewrites the CSV in place)
"""

from __future__ import annotations

import csv
import random
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))

from fuzzy_reference import partial_ratio_ref, ratio_ref, token_set_ratio_ref

OUT = Path(__file__).resolve().parents[1] / "tests" / "golden" / "fuzzy_golden.csv"

WORDS = [
    "rio", "grande", "san", "juan", "valley", "lake", "north", "fork",
    "santa", "cruz", "county", "park", "mount", "saint", "helena", "creek",
    "black", "river", "el", "paso", "nuevo", "la", "sierra", "alta",
]
UNI_WORDS = ["são", "paulo", "córdoba", "münchen", "žilina", "km²", "中国", "日本"]


def _phrase(rng: random.Random, words: list[str], lo: int = 1, hi: int = 4) -> str:
    return " ".join(rng.choice(words) for _ in range(rng.randint(lo, hi)))


def build_pairs() -> list[tuple[str, str]]:
    rng = random.Random(20260817)
    pairs: list[tuple[str, str]] = []

    # public rapidfuzz documentation examples (hand-checked in
    # tests/test_fuzzy_golden.py against their published outputs)
    pairs += [
        ("this is a test", "this is a test!"),
        ("fuzzy wuzzy was a bear", "wuzzy fuzzy was a bear"),
        ("fuzzy was a bear", "fuzzy fuzzy was a bear"),
        ("bcx", "abc"),  # ADVICE.md boundary-window case: 80.0
    ]
    # degenerate shapes
    pairs += [("", ""), ("", "abc"), ("abc", ""), ("a", "a"), ("a", "b"),
              ("ab", "ba"), ("aaa", "aaaa"), (" ", "  ")]

    # random phrase pairs (ascii)
    for _ in range(1500):
        pairs.append((_phrase(rng, WORDS), _phrase(rng, WORDS)))
    # perturbed copies: char edits of one side
    for _ in range(800):
        s = _phrase(rng, WORDS)
        t = list(s)
        for _ in range(rng.randint(1, 3)):
            op = rng.randint(0, 2)
            pos = rng.randrange(max(len(t), 1))
            if op == 0 and t:
                del t[pos % len(t)]
            elif op == 1:
                t.insert(pos, rng.choice("abcxyz "))
            elif t:
                t[pos % len(t)] = rng.choice("abcxyz ")
        pairs.append((s, "".join(t)))
    # unicode phrases
    for _ in range(400):
        pairs.append((_phrase(rng, UNI_WORDS), _phrase(rng, WORDS + UNI_WORDS)))
    # substring containment
    for _ in range(300):
        s = _phrase(rng, WORDS, 2, 5)
        i = rng.randrange(len(s))
        j = rng.randrange(i + 1, len(s) + 1)
        pairs.append((s[i:j], s))
    # boundary-window adversarials: needle = overlap + overhang, so the best
    # alignment clips at an end of the haystack
    for _ in range(1200):
        core = _phrase(rng, WORDS, 1, 2)
        pre = "".join(rng.choice("qzx#") for _ in range(rng.randint(1, 4)))
        suf = "".join(rng.choice("qzx#") for _ in range(rng.randint(1, 4)))
        hay = _phrase(rng, WORDS, 1, 2)
        if rng.random() < 0.5:
            pairs.append((core + suf, hay + " " + core))  # right overhang
        else:
            pairs.append((pre + core, core + " " + hay))  # left overhang
    # equal-length pairs (both directions clip)
    for _ in range(400):
        s = _phrase(rng, WORDS, 1, 2)
        k = rng.randint(1, min(3, len(s)))
        pairs.append((s[k:] + "".join(rng.choice("qzx") for _ in range(k)), s))
    # long strings (> 63 chars: scalar fallback path in fuzzy_batch)
    for _ in range(100):
        pairs.append((_phrase(rng, WORDS, 10, 18), _phrase(rng, WORDS, 10, 18)))
    for _ in range(50):
        s = _phrase(rng, WORDS, 10, 18)
        pairs.append((s[: rng.randint(5, 30)], s))
    return pairs


def main() -> None:
    OUT.parent.mkdir(parents=True, exist_ok=True)
    with OUT.open("w", newline="", encoding="utf-8") as fh:
        w = csv.writer(fh, quoting=csv.QUOTE_ALL)
        w.writerow(["a", "b", "ratio", "partial_ratio", "token_set_ratio"])
        for a, b in build_pairs():
            w.writerow(
                [
                    a,
                    b,
                    repr(ratio_ref(a, b)),
                    repr(partial_ratio_ref(a, b)),
                    repr(token_set_ratio_ref(a, b)),
                ]
            )
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
