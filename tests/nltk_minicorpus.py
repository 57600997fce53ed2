"""Minimal REAL NLTK data tree, synthesized at test time.

This image ships no NLTK corpora (and has no network egress), which used to
skip the real-corpus retriever tests.  Instead of stubbing the nltk API we
write a *genuine* (tiny) data tree — WNDB-format WordNet database files, a
stopword list, and empty punkt_tab parameter files — so the exact NLTK code
paths the production retriever uses (`wn.synsets(..., pos=wn.NOUN)`,
`wn.synset(name).definition()`, `stopwords.words`, `word_tokenize`) all run
against the real readers (reference consumes the full corpora the same way:
mars/components/TextRetrieverModule.py:126-185, main_MARS.py:168-170).

The WNDB files follow the documented wndb(5WN) layout; offsets in
``data.noun`` are true byte offsets (fixed-width 8-digit fields keep line
lengths independent of the offset values, so a single pass suffices —
no cross-synset pointers are emitted).
"""
from __future__ import annotations

import os

# (lemmas, lex_filenum, gloss) — lemmas' order defines sense numbering:
# dog.n.01 = the canid, plant.n.01 = the organism (with a 'pot' token for
# overlap-disambiguation tests), plant.n.02 = the factory.
_SYNSETS = [
    (["dog", "domestic_dog"], 3, "a domesticated canid mammal kept as a pet"),
    (["frank", "hotdog", "dog"], 4,
     "a smooth-textured sausage usually served on a bun"),
    (["plant", "flora"], 5, "a living organism that grows in soil or a pot"),
    (["plant", "works"], 6, "buildings for carrying on industrial labor"),
    (["sheep"], 3, "woolly usually horned ruminant mammal"),
    (["person"], 7, "a human being"),
]

_LEXNAMES = [
    "adj.all", "adj.pert", "adv.all", "noun.animal", "noun.food",
    "noun.plant", "noun.artifact", "noun.person", "noun.Tops", "verb.body",
]

_STOPWORDS = (
    "a an the in of on at by for with without to from into over under "
    "is are was were be been being as it its this that these those and "
    "or but not no nor so than too very can will just"
).split()


def _wordnet_files():
    data_lines, offsets = [], []
    cursor = 0
    for lemmas, lexnum, gloss in _SYNSETS:
        offsets.append(cursor)
        words = " ".join(f"{w} 0" for w in lemmas)
        line = "%08d %02d n %02x %s %03d | %s  \n" % (
            cursor, lexnum, len(lemmas), words, 0, gloss)
        data_lines.append(line)
        cursor += len(line)

    lemma_offsets = {}
    for (lemmas, _, _), off in zip(_SYNSETS, offsets):
        for w in lemmas:
            lemma_offsets.setdefault(w, []).append(off)
    index_lines = []
    for lemma in sorted(lemma_offsets):
        offs = lemma_offsets[lemma]
        index_lines.append(
            "%s n %d 0 %d 0 %s  \n"
            % (lemma, len(offs), len(offs), " ".join("%08d" % o for o in offs))
        )

    files = {
        "data.noun": "".join(data_lines),
        "index.noun": "".join(index_lines),
        "lexnames": "".join(
            "%02d\t%s\t3\n" % (i, n) for i, n in enumerate(_LEXNAMES)),
    }
    for empty in ("index.verb", "index.adj", "index.adv", "data.verb",
                  "data.adj", "data.adv", "noun.exc", "verb.exc", "adj.exc",
                  "adv.exc", "cntlist.rev", "index.sense"):
        files[empty] = ""
    return files


def ensure_minicorpus(root: str) -> str:
    """Write the tree under ``root`` (idempotent) and return ``root``."""
    wn_dir = os.path.join(root, "corpora", "wordnet")
    sw_dir = os.path.join(root, "corpora", "stopwords")
    pk_dir = os.path.join(root, "tokenizers", "punkt_tab", "english")
    for d in (wn_dir, sw_dir, pk_dir):
        os.makedirs(d, exist_ok=True)
    for name, content in _wordnet_files().items():
        with open(os.path.join(wn_dir, name), "w") as f:
            f.write(content)
    with open(os.path.join(sw_dir, "english"), "w") as f:
        f.write("\n".join(_STOPWORDS) + "\n")
    # empty punkt parameters load fine and only drop abbreviation handling
    for name in ("collocations.tab", "sent_starters.txt",
                 "abbrev_types.txt", "ortho_context.tab"):
        with open(os.path.join(pk_dir, name), "w") as f:
            f.write("")
    return root


def install(root: str) -> None:
    """Build the tree and put it on nltk's search path (front)."""
    import nltk.data

    ensure_minicorpus(root)
    if root not in nltk.data.path:
        nltk.data.path.insert(0, root)
