"""Generate the language dictionaries shipped in ``dictionary/``.

The reference framework consumes per-language word->phoneme tables
(``dictionary/{lang}.txt``: ``word\\tph ph``), phoneme typing tables
(``dictionary/{lang}_phones.txt``: ``ph consonant|vowel category``) and a
cross-lingual merge map (``dictionary/global.csv``) — see
``/root/reference/handler/preprocess/handler.py:34-60`` and
``component/binarizer/binarizer_utils.py:16-60`` for the consumers.

These are data tables, not code. This script *generates* them from their
documented public sources so the provenance is explicit:

- zh: the standard Mandarin pinyin syllable chart decomposed into
  initial+final using the opencpop-extension phoneme convention
  (zhi/chi/shi/ri -> ``ir``; zi/ci/si -> ``i0``; u-umlaut -> ``v``;
  ye -> ``y E``, yan -> ``y En``; y/w kept as onset consonants).
- jp: the romaji syllabary (gojuon + youon + extended katakana sounds)
  with the standard Japanese SVS phoneme set (N for the moraic nasal,
  ``cl`` for the sokuon/glottal stop).
- en: a converter from CMUdict (public domain, CMU license) applying the
  convention used by English SVS dictionaries: lowercase, stress digits
  stripped, AH0 -> ``ax`` (schwa), intervocalic flapping t/d -> ``dx``,
  and tr/dr affrication -> ``ch _r`` / ``jh _r``.

Run ``python tools/build_dictionaries.py --out dictionary`` to rebuild.
"""

from __future__ import annotations

import argparse
import os
import re

# --------------------------------------------------------------------------
# Mandarin (zh) — pinyin chart, opencpop-extension phoneme convention
# --------------------------------------------------------------------------

# Finals each initial group combines with (standard pinyin phonotactics).
_ZH_FINALS = {
    # labials
    "b": "a ai an ang ao ei en eng i ian iao ie in ing o u",
    "p": "a ai an ang ao ei en eng i ian iao ie in ing o ou u",
    "m": "a ai an ang ao e ei en eng i ian iao ie in ing iu o ou u",
    "f": "a an ang ei en eng o ou u",
    # alveolars
    "d": "a ai an ang ao e ei en eng i ia ian iao ie ing iu ong ou u uan ui un uo",
    "t": "a ai an ang ao e ei eng i ian iao ie ing ong ou u uan ui un uo",
    "n": "a ai an ang ao e ei en eng i ian iang iao ie in ing iu ong ou u uan un uo v ve",
    "l": "a ai an ang ao e ei eng i ia ian iang iao ie in ing iu o ong ou u uan un uo v ve",
    # velars
    "g": "a ai an ang ao e ei en eng ong ou u ua uai uan uang ui un uo",
    "k": "a ai an ang ao e ei en eng ong ou u ua uai uan uang ui un uo",
    "h": "a ai an ang ao e ei en eng ong ou u ua uai uan uang ui un uo",
    # palatals (written u is the umlaut -> v)
    "j": "i ia ian iang iao ie in ing iong iu v van ve vn",
    "q": "i ia ian iang iao ie in ing iong iu v van ve vn",
    "x": "i ia ian iang iao ie in ing iong iu v van ve vn",
    # retroflexes (apical vowel -> ir)
    "zh": "a ai an ang ao e ei en eng ir ong ou u ua uai uan uang ui un uo",
    "ch": "a ai an ang ao e en eng ir ong ou u ua uai uan uang ui un uo",
    "sh": "a ai an ang ao e ei en eng ir ou u ua uai uan uang ui un uo",
    "r": "an ang ao e en eng ir ong ou u ua uan ui un uo",
    # sibilants (apical vowel -> i0)
    "z": "a ai an ang ao e ei en eng i0 ong ou u uan ui un uo",
    "c": "a ai an ang ao e ei en eng i0 ong ou u uan ui un uo",
    "s": "a ai an ang ao e en eng i0 ong ou u uan ui un uo",
    # glides (kept as onsets; ye/yan use the E/En vowels)
    "y": "a E En ang ao i in ing o ong ou v van ve vn",
    "w": "a ai an ang ei en eng o u",
}
# zero-initial syllables: the final IS the word
_ZH_STANDALONE = "a ai an ang ao e ei en eng er o ou".split()

# how a phonemic final is written in the pinyin word for each onset class
_ZH_SPELL = {
    ("y", "E"): "e", ("y", "En"): "an", ("y", "v"): "u",
    ("y", "van"): "uan", ("y", "ve"): "ue", ("y", "vn"): "un",
    ("j", "v"): "u", ("j", "van"): "uan", ("j", "ve"): "ue", ("j", "vn"): "un",
    ("q", "v"): "u", ("q", "van"): "uan", ("q", "ve"): "ue", ("q", "vn"): "un",
    ("x", "v"): "u", ("x", "van"): "uan", ("x", "ve"): "ue", ("x", "vn"): "un",
}


def build_zh():
    entries = {}
    for final in _ZH_STANDALONE:
        entries[final] = final
    for initial, finals in _ZH_FINALS.items():
        for final in finals.split():
            if final in ("ir", "i0"):
                written = initial + "i"
            else:
                written = initial + _ZH_SPELL.get((initial, final), final)
            entries[written] = f"{initial} {final}"
            # umlaut finals also accept the literal v-spelling (jv == ju etc.)
            if (initial, final) in _ZH_SPELL and final.startswith("v"):
                entries[initial + final] = f"{initial} {final}"
    return entries


_ZH_PHONES = """\
b consonant stop
c consonant affricate
ch consonant affricate
d consonant stop
f consonant fricative
g consonant stop
h consonant aspirate
j consonant affricate
k consonant stop
l consonant liquid
m consonant nasal
n consonant nasal
p consonant stop
q consonant fricative
r consonant semivowel
s consonant fricative
sh consonant fricative
t consonant stop
w consonant semivowel
x consonant fricative
y consonant semivowel
z consonant affricate
zh consonant affricate
E vowel vowel
En vowel diphthong
a vowel vowel
ai vowel diphthong
an vowel vowel
ang vowel vowel
ao vowel diphthong
e vowel vowel
ei vowel diphthong
en vowel vowel
eng vowel vowel
er vowel vowel
i vowel vowel
i0 vowel vowel
ia vowel diphthong
ian vowel diphthong
iang vowel diphthong
iao vowel diphthong
ie vowel diphthong
in vowel diphthong
ing vowel diphthong
iong vowel diphthong
ir vowel vowel
iu vowel diphthong
o vowel vowel
ong vowel vowel
ou vowel diphthong
u vowel vowel
ua vowel diphthong
uai vowel diphthong
uan vowel diphthong
uang vowel diphthong
ui vowel diphthong
un vowel diphthong
uo vowel diphthong
v vowel vowel
van vowel diphthong
ve vowel diphthong
vn vowel vowel"""


# --------------------------------------------------------------------------
# Japanese (jp) — romaji syllabary, SVS phoneme set
# --------------------------------------------------------------------------

# onset -> romaji spellings of the five vowel morae (None = mora not written)
_JP_ROWS = {
    "k": "ka ki ku ke ko", "kw": "kwa kwi kwu kwe kwo", "ky": "kya kyi kyu kye kyo",
    "s": "sa si su se so", "sh": "sha shi shu she sho",
    "t": "ta ti tu te to", "ts": "tsa tsi tsu tse tso", "ty": "tya tyi tyu tye tyo",
    "ch": "cha chi chu che cho",
    "n": "na ni nu ne no", "ny": "nya nyi nyu nye nyo",
    "h": "ha hi hu he ho", "hy": "hya hyi hyu hye hyo", "f": "fa fi fu fe fo",
    "m": "ma mi mu me mo", "my": "mya myi myu mye myo",
    "y": "ya yi yu ye yo",
    "r": "ra ri ru re ro", "ry": "rya ryi ryu rye ryo",
    "w": "wa wi wu we wo",
    "g": "ga gi gu ge go", "gw": "gwa gwi gwu gwe gwo", "gy": "gya gyi gyu gye gyo",
    "z": "za zi zu ze zo", "j": "ja ji ju je jo",
    "d": "da di du de do", "dy": "dya dyi dyu dye dyo",
    "b": "ba bi bu be bo", "by": "bya byi byu bye byo",
    "p": "pa pi pu pe po", "py": "pya pyi pyu pye pyo",
    "v": "va vi vu ve vo",
}
_JP_VOWELS = "a i u e o".split()


def build_jp():
    entries = {"cl": "cl", "a": "a", "i": "i", "u": "u", "e": "e", "o": "o", "n": "N"}
    for onset, row in _JP_ROWS.items():
        for vowel, written in zip(_JP_VOWELS, row.split()):
            entries[written] = f"{onset} {vowel}"
            # romaji alias spellings: l- for the r row, jy- for the j row
            if onset == "r":
                entries["l" + written[1:]] = f"{onset} {vowel}"
            if onset == "j":
                entries["jy" + written[1:]] = f"{onset} {vowel}"
    return entries


_JP_PHONES = """\
b consonant stop
by consonant stop
ch consonant affricate
d consonant stop
dy consonant stop
f consonant fricative
g consonant stop
gw consonant stop
gy consonant stop
h consonant aspirate
hy consonant aspirate
j consonant affricate
k consonant stop
kw consonant stop
ky consonant stop
m consonant nasal
my consonant nasal
n consonant nasal
ny consonant nasal
p consonant stop
py consonant stop
r consonant liquid
ry consonant liquid
s consonant fricative
sh consonant fricative
t consonant stop
ts consonant affricate
ty consonant affricate
v consonant semivowel
w consonant semivowel
y consonant semivowel
z consonant affricate
N vowel nasal
a vowel vowel
cl vowel stop
e vowel vowel
i vowel vowel
o vowel vowel
u vowel vowel"""


# --------------------------------------------------------------------------
# English (en) — CMUdict converter
# --------------------------------------------------------------------------

_EN_PHONES = """\
b consonant stop
ch consonant affricate
d consonant stop
dx consonant stop
dr consonant affricate
dh consonant fricative
f consonant fricative
g consonant stop
hh consonant aspirate
jh consonant affricate
k consonant stop
l consonant liquid
m consonant nasal
n consonant nasal
ng consonant nasal
p consonant stop
r consonant semivowel
s consonant fricative
sh consonant fricative
t consonant stop
tr consonant affricate
th consonant fricative
v consonant fricative
w consonant semivowel
y consonant semivowel
z consonant fricative
zh consonant fricative
aa vowel vowel
ae vowel vowel
ah vowel vowel
ao vowel vowel
aw vowel diphthong
ax vowel vowel
ay vowel diphthong
eh vowel vowel
er vowel vowel
ey vowel diphthong
ih vowel vowel
iy vowel vowel
ow vowel diphthong
oy vowel diphthong
uh vowel vowel
uw vowel vowel"""

_EN_VOWELS = {
    "aa", "ae", "ah", "ao", "aw", "ax", "ay", "eh", "er", "ey",
    "ih", "iy", "ow", "oy", "uh", "uw",
}


def convert_cmudict_pron(arpa_tokens):
    """CMUdict phones (with stress digits) -> the SVS en phoneme convention.

    Rules:
      1. lowercase, record stress, strip digits; AH0 -> ax (schwa).
      2. affrication: t+r -> "ch _r", d+r -> "jh _r" (exact in the shipped
         table).
      3. t/d flapping -> dx between a stressed vowel (incl. er, excl. a
         consonant r) and an unstressed vowel. NOTE: flapping in the shipped
         en.txt is lexically conditioned (e.g. "widow" flaps, "shadow" does
         not, in identical phonetic contexts), so this deterministic rule is
         an approximation — use it to extend coverage for new words, not to
         regenerate the curated table.
    """
    phones = []
    stress = []
    for tok in arpa_tokens:
        m = re.fullmatch(r"([A-Za-z]+)([0-2]?)", tok)
        ph, st = m.group(1).lower(), m.group(2)
        if ph == "ah" and st == "0":
            ph = "ax"
        phones.append(ph)
        stress.append(st)
    out = []
    i = 0
    n = len(phones)
    while i < n:
        ph = phones[i]
        nxt = phones[i + 1] if i + 1 < n else None
        prv = out[-1] if out else None
        if ph in ("t", "d") and nxt == "r":
            out.append("ch" if ph == "t" else "jh")
            out.append("_r")
            i += 2
            continue
        if (
            ph in ("t", "d")
            and prv is not None
            and prv in _EN_VOWELS
            and i > 0
            and stress[i - 1] in ("1", "2")
            and nxt is not None
            and nxt in _EN_VOWELS
            and stress[i + 1] == "0"
        ):
            out.append("dx")
            i += 1
            continue
        out.append(ph)
        i += 1
    return out


def build_en_from_cmudict(cmudict_path: str):
    entries = {}
    with open(cmudict_path, encoding="latin-1") as f:
        for line in f:
            if not line.strip() or line.startswith(";;;"):
                continue
            word, _, pron = line.partition(" ")
            if not pron.strip():
                word, _, pron = line.partition("\t")
            word = word.strip().lower()
            word = re.sub(r"\(\d+\)$", "", word)  # keep first variant only
            if word in entries:
                continue
            entries[word] = " ".join(convert_cmudict_pron(pron.split()))
    return entries


def normalize_table(path: str, phones_allowed: set):
    """Validate + normalize an existing ``word\\tph ph`` table: every phone
    must be in the allowed inventory; whitespace canonicalized; sorted."""
    entries = {}
    with open(path, encoding="utf-8") as f:
        for ln, line in enumerate(f, 1):
            line = line.rstrip("\n")
            if not line.strip():
                continue
            word, _, pron = line.partition("\t")
            phs = pron.split()
            assert phs, f"{path}:{ln}: empty pronunciation"
            for ph in phs:
                assert ph in phones_allowed, f"{path}:{ln}: unknown phone {ph!r}"
            entries[word] = " ".join(phs)
    return entries


# --------------------------------------------------------------------------
# Cross-lingual merge map
# --------------------------------------------------------------------------

# Phonemes that are acoustically equivalent across languages share one global
# symbol so multilingual models pool their data (consumer:
# ``binarizer_utils.build_phone_encoder``). Mandarin writes its unaspirated
# unvoiced stops b/d/g where Japanese writes p/t/k.
_GLOBAL_CSV = """\
global,zh,jp
a,a,a
o,o,o
i,i,i
p,b,p
m,m,m
t,d,t
n,n,n
k,g,k
s,s,s"""


def phones_set(phones_txt: str):
    return {line.split()[0] for line in phones_txt.splitlines()} | {"AP", "SP", "_r"}


def write_table(entries: dict, path: str):
    with open(path, "w", encoding="utf-8", newline="\n") as f:
        for word in sorted(entries):
            f.write(f"{word}\t{entries[word]}\n")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="dictionary")
    ap.add_argument("--cmudict", default=None,
                    help="path to a CMUdict file to build en.txt from")
    ap.add_argument("--en-table", default=None,
                    help="existing en word\\tph table to validate+normalize "
                         "instead of building from CMUdict")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    write_table(build_zh(), os.path.join(args.out, "zh.txt"))
    write_table(build_jp(), os.path.join(args.out, "jp.txt"))
    for lang, phones in (("zh", _ZH_PHONES), ("jp", _JP_PHONES), ("en", _EN_PHONES)):
        with open(os.path.join(args.out, f"{lang}_phones.txt"), "w", newline="\n") as f:
            f.write(phones)
    with open(os.path.join(args.out, "global.csv"), "w", newline="\n") as f:
        f.write(_GLOBAL_CSV)
    if args.cmudict:
        write_table(build_en_from_cmudict(args.cmudict),
                    os.path.join(args.out, "en.txt"))
    elif args.en_table:
        write_table(normalize_table(args.en_table, phones_set(_EN_PHONES)),
                    os.path.join(args.out, "en.txt"))
    print(f"| dictionaries written to {args.out}/")


if __name__ == "__main__":
    main()
