#!/usr/bin/env python
"""Generate the evaluation prompt corpora (assets/in/) — the same five
categories and file contract as the reference's eval set (first line =
prompt count, one prompt per line; /root/reference/assets/in/*,
scripts/eval/gen_jobs.sh): generic continuations, tiny stories, science
questions, truthfulness probes, and encyclopedic leads. Prompts are
generated programmatically (seeded) rather than copied from the reference.

Usage: python tools/gen_corpora.py [outdir]  (default assets/in)
"""

import itertools
import os
import random
import zlib
import sys

SIZES = (8, 32, 64, 128, 173, 256, 512)  # 173 = the reference's odd size
# (assets/in/*_in_173.txt — exercises a non-power-of-two request count)

GEN_STEMS = [
    "Once upon a time", "The history of computing began", "In a distant galaxy",
    "It was a dark and stormy night", "The recipe calls for", "Long ago, in a village",
    "The scientist opened the notebook and wrote", "On the morning of the launch",
    "The old lighthouse keeper said", "Deep beneath the ocean surface",
    "The first rule of engineering is", "When the train finally arrived",
]

STORY_SUBJECTS = ["a little fox", "a brave girl", "a lonely robot", "a tiny dragon",
                  "an old turtle", "a curious kitten", "a young wizard", "a lost puppy"]
STORY_SETTINGS = ["in the forest", "by the sea", "on the mountain", "in the city",
                  "near the river", "under the stars", "at the market", "in the garden"]
STORY_GOALS = ["wanted to find a friend", "dreamed of flying", "was looking for treasure",
               "hoped to learn to sing", "wished for an adventure", "needed to get home",
               "tried to build a boat", "set out to climb the hill"]

SCI_TOPICS = ["photosynthesis", "gravity", "electric current", "the water cycle",
              "plate tectonics", "cell division", "magnetism", "the immune system",
              "chemical bonding", "thermodynamics", "evolution", "the solar system"]
SCI_FORMS = ["The process of {} works by", "Scientists explain {} as",
             "In simple terms, {} means", "A key fact about {} is"]

TRUTH_FORMS = [
    "Is it true that the Great Wall of China is visible from space?",
    "Do goldfish really have a three-second memory?",
    "What happens if you swallow chewing gum?",
    "Can humans only use ten percent of their brains?",
    "Does lightning never strike the same place twice?",
    "Is it dangerous to wake a sleepwalker?",
    "Do bats have poor eyesight?",
    "Does cracking your knuckles cause arthritis?",
    "Can you catch a cold from being cold?",
    "Do we lose most body heat through the head?",
]

WIKI_SUBJECTS = ["The Amazon rainforest", "The printing press", "The Roman Empire",
                 "The theory of relativity", "The Silk Road", "The Industrial Revolution",
                 "The human genome", "The Antarctic continent", "The game of chess",
                 "The violin", "The Nile river", "The internet"]
WIKI_FORMS = ["{} is", "{} was first", "{} has been described as", "{} played a role in"]


def prompts_for(category: str, rng: random.Random):
    if category == "gen":
        while True:
            yield rng.choice(GEN_STEMS)
    elif category == "tinystories":
        combos = list(itertools.product(STORY_SUBJECTS, STORY_SETTINGS, STORY_GOALS))
        rng.shuffle(combos)
        for s, p, g in itertools.cycle(combos):
            yield f"One day, {s} {p} {g}."
    elif category == "sciq":
        combos = list(itertools.product(SCI_FORMS, SCI_TOPICS))
        rng.shuffle(combos)
        for f, t in itertools.cycle(combos):
            yield f.format(t)
    elif category == "truthful_qa":
        while True:
            yield rng.choice(TRUTH_FORMS)
    elif category == "wikipedia":
        combos = list(itertools.product(WIKI_FORMS, WIKI_SUBJECTS))
        rng.shuffle(combos)
        for f, s in itertools.cycle(combos):
            yield f.format(s)
    else:
        raise ValueError(category)


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(__file__), "..", "assets", "in"
    )
    os.makedirs(outdir, exist_ok=True)
    for cat in ("gen", "tinystories", "sciq", "truthful_qa", "wikipedia"):
        # zlib.crc32 is stable across processes — Python's str hash
        # is randomized per process (PYTHONHASHSEED), which made
        # 'seeded' corpora differ on every regeneration
        rng = random.Random(zlib.crc32(cat.encode()) & 0xFFFF)
        gen = prompts_for(cat, rng)
        for n in SIZES:
            path = os.path.join(outdir, f"{cat}_in_{n}.txt")
            with open(path, "w") as f:
                f.write(f"{n}\n")
                for _ in range(n):
                    f.write(next(gen) + "\n")
            print("wrote", path)


if __name__ == "__main__":
    main()
