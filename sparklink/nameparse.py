"""Probabilistic name / address component tagging — the true-sequence-model
upgrade of the regex splitters in score.py, re-creating the behavior of the
reference's CRF parsing plugins (dedupe-variable-name / dedupe-variable-address
backed by probableparsing, extended-variables/officers.py:109-110 [lib]).

Engine: a linear-chain structured perceptron (averaged) decoded with Viterbi.
Unlike a port of python-crfsuite, both training and decoding are numpy
batch-DP in the same style as distances.py — the decoder is vectorized
ACROSS ROWS of an Arrow batch (emissions = boolean-feature tensor × weight
matrix; one DP sweep over token positions decodes every row at once), so the
pandas UDF stays vectorized with no per-row Python in the hot path.

Training data is synthesized deterministically (seeded) from embedded
public-knowledge lexicons (common given names incl. the diminutive table,
surnames, honorifics, generational suffixes, USPS street types /
directionals / unit markers) over a realistic template inventory that
includes the adversarial orderings the regex splitter cannot represent:

- ``dr smith john r``      -> honorific + LAST FIRST MIDDLE (lexicon-driven)
- ``maria van helsing``    -> multi-token particle surname
- ``unit b 12 oak ave``    -> leading occupancy unit

The tagger is trained once per driver process (lru_cache) in well under a
second; its two small weight matrices ship to executors inside the UDF
closure (broadcast by construction, O(1) plan size).
"""

from __future__ import annotations

import re
from functools import lru_cache

import numpy as np
import pandas as pd


# --------------------------------------------------------------------------
# lexicons (public knowledge; given/surname lists are deliberately small —
# they are FEATURES for disambiguation, not gazetteers: open-class tokens
# fall back to positional/transition evidence)
# --------------------------------------------------------------------------

_GIVEN = """
james john robert michael william david richard joseph thomas charles
christopher daniel matthew anthony mark donald steven paul andrew joshua
kenneth kevin brian george edward ronald timothy jason jeffrey ryan jacob
gary nicholas eric jonathan stephen larry justin scott brandon benjamin
samuel gregory frank alexander raymond patrick jack dennis jerry tyler
aaron jose adam henry nathan douglas zachary peter kyle walter ethan
jeremy harold keith christian roger noah gerald carl terry sean austin
arthur lawrence jesse dylan bryan joe jordan billy bruce albert willie
gabriel logan alan juan wayne roy ralph randy eugene vincent russell
elijah louis bobby philip johnny mary patricia jennifer linda elizabeth
barbara susan jessica sarah karen lisa nancy betty margaret sandra ashley
kimberly emily donna michelle carol amanda dorothy melissa deborah
stephanie rebecca sharon laura cynthia kathleen amy angela shirley anna
brenda pamela emma nicole helen samantha katherine christine debra rachel
carolyn janet catherine maria heather diane ruth julie olivia joyce
virginia victoria kelly lauren christina joan evelyn judith megan andrea
cheryl hannah jacqueline martha gloria teresa ann sara madison frances
kathryn janice jean abigail alice julia judy sophia grace denise amber
doris marilyn danielle beverly isabella theresa diana natalie brittany
charlotte marie kayla alexis lori
""".split()

_SURNAME = """
smith johnson williams brown jones garcia miller davis rodriguez martinez
hernandez lopez gonzalez wilson anderson thomas taylor moore jackson martin
lee perez thompson white harris sanchez clark ramirez lewis robinson walker
young allen king wright torres nguyen hill flores green adams nelson baker
hall rivera campbell mitchell carter roberts gomez phillips evans turner
diaz parker cruz edwards collins reyes stewart morris morales murphy cook
rogers gutierrez ortiz morgan cooper peterson bailey reed kelly howard
ramos kim cox ward richardson watson brooks chavez wood james bennett gray
mendoza ruiz hughes price alvarez castillo sanders patel myers long ross
foster jimenez powell jenkins perry russell sullivan bell coleman butler
henderson barnes gonzales fisher vasquez simmons romero jordan patterson
alexander hamilton graham reynolds griffin wallace moreno west cole hayes
bryant herrera gibson ellis tran medina aguilar stevens murray ford castro
marshall owens harrison fernandez mcdonald woods washington kennedy wells
vargas henry chen freeman webb tucker guzman burns crawford olson simpson
porter hunter gordon mendez silva shaw snyder mason dixon munoz hunt hicks
holmes palmer wagner black robertson boyd rose stone salazar fox warren
mills meyer rice schmidt garza daniels ferguson nichols stephens soto
weaver ryan gardner payne grant dunn kelley spencer hawkins arnold pierce
vazquez hansen peters santos hart bradley knight elliott cunningham duncan
armstrong hudson carroll lane riley andrews alvarado ray delgado berry
perkins hoffman johnston matthews pena richards contreras willis carpenter
lawrence sandoval guerrero george chapman rios estrada ortega watkins
greene nunez wheeler valdez harper burke larson santiago maldonado morrison
franklin carlson austin dominguez carr lawson jacobs obrien lynch singh
vega bishop montgomery oliver jensen harvey williamson gilbert dean sims
espinoza howell li wong reid hanson le mccoy garrett burton fuller wang
weber welch rojas lucas marquez fields park yang little banks padilla day
walsh bowman schultz luna fowler mejia helsing
""".split()

_HONORIFICS = "mr mrs ms miss dr prof rev hon capt lt sgt col gen fr sr sister".split()
# 'sr' doubles as a suffix; the template contexts teach the position split
_SUFFIXES = "jr sr ii iii iv v md esq phd dds rn".split()
_PARTICLES = "van von de del della der da di du la le mac st o".split()
_NICK_KEYS = """
bill billy will willie liam bob bobby rob robbie bert dick rick ricky rich
richie jim jimmy jamie jack johnny jon tom tommy mike mikey dave davey dan
danny joe joey chris kit chuck charlie ed eddie ted teddy ned tony drew
andy steve ken kenny matt pete greg ron ronnie don donnie ray sam sammy
alex fred freddie frank frankie hank harry nick zack zach gabe ben benny
abe larry jerry tim timmy walt gene herb stan phil doug russ wes stu liz
beth betsy betty eliza peggy meg maggie marge kate katie kathy kay cathy
sue susie patty trish debbie deb barb jen jenny jess mandy becky vicky
ginny nan
""".split()

_DIRECTIONALS = "n s e w ne nw se sw north south east west northeast northwest southeast southwest".split()
_STREET_TYPES = """
st street ave avenue rd road blvd boulevard dr drive ln lane ct court pl
place hwy highway pkwy parkway ter terrace cir circle way sq square trl
trail aly alley plz plaza
""".split()
_UNIT_MARKERS = "apt apartment unit suite ste fl floor rm room no bldg".split()
# open-class street-name words for the synthesizer (includes 'chester' /
# 'western', the regex path's marker-inside-word corruption examples)
_STREET_WORDS = """
main oak maple washington park lake hill elm cedar pine madison jefferson
chester western walnut spring church center mill river franklin prospect
highland sunset meadow ridge valley forest chestnut lincoln jackson dogwood
sycamore willow locust hickory laurel magnolia broadway
""".split()

_GIVEN_ARR = np.array(sorted(set(_GIVEN)))
_SURNAME_ARR = np.array(sorted(set(_SURNAME)))
_NICK_ARR = np.array(sorted(set(_NICK_KEYS)))
_HON_ARR = np.array(sorted(set(_HONORIFICS)))
_SUF_ARR = np.array(sorted(set(_SUFFIXES)))
_PART_ARR = np.array(sorted(set(_PARTICLES)))
_DIR_ARR = np.array(sorted(set(_DIRECTIONALS)))
_STYPE_ARR = np.array(sorted(set(_STREET_TYPES)))
_UMARK_ARR = np.array(sorted(set(_UNIT_MARKERS)))

# tag inventories
NAME_TAGS = ("PRE", "FIRST", "MID", "LAST", "SUF")
ADDR_TAGS = ("NUM", "PREDIR", "STREET", "POSTTYPE", "POSTDIR", "UNITTYPE", "UNITID")
_N_T = {t: i for i, t in enumerate(NAME_TAGS)}
_A_T = {t: i for i, t in enumerate(ADDR_TAGS)}

NAME_MAX_LEN = 8
ADDR_MAX_LEN = 10
N_NAME_FEATS = 12
N_ADDR_FEATS = 12


# --------------------------------------------------------------------------
# tokenization + batched featurization (all array-level after one split)
# --------------------------------------------------------------------------

def _pad_tokens(token_lists: list[list[str]], max_len: int) -> tuple[np.ndarray, np.ndarray]:
    """list of token lists -> (tokens [n, max_len] unicode, lens [n])."""
    n = len(token_lists)
    lens = np.fromiter((min(len(t), max_len) for t in token_lists), dtype=np.int64, count=n)
    tok = np.full((n, max_len), "", dtype="<U32")
    for i, ts in enumerate(token_lists):  # training-set packing only, O(n)
        L = lens[i]
        if L:
            tok[i, :L] = [t[:32] for t in ts[:L]]
    return tok, lens


def _tokenize_matrix(texts: pd.Series, max_len: int) -> tuple[np.ndarray, np.ndarray]:
    """Batch tokenize WITHOUT a per-row Python loop: one pandas split into a
    padded frame -> ([n, W<=max_len] '<U32' raw tokens, lens [n])."""
    s = texts.fillna("").astype(str).str.lower()
    parts = s.str.split(expand=True)
    if parts.shape[1] == 0:
        parts = pd.DataFrame("", index=s.index, columns=[0])
    parts = parts.iloc[:, :max_len]
    lens = parts.notna().sum(axis=1).to_numpy(dtype=np.int64)
    raw = parts.fillna("").to_numpy(dtype="<U32")  # >32-char tokens truncate
    return raw, lens


def _name_tokenize(texts: pd.Series) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """-> (stripped tokens [n,L], comma_end [n,L], lens)."""
    lists = texts.fillna("").str.lower().str.split().tolist()
    raw, lens = _pad_tokens(lists, NAME_MAX_LEN)
    comma_end = np.char.endswith(raw, ",")
    tok = np.char.strip(raw, ".,")
    return tok, comma_end, lens


def _addr_tokenize(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    lists = texts.fillna("").str.lower().str.split().tolist()
    raw, lens = _pad_tokens(lists, ADDR_MAX_LEN)
    tok = np.char.strip(raw, ".,")
    return tok, lens


def _contains_digit(tok: np.ndarray) -> np.ndarray:
    n, L = tok.shape
    return (
        pd.Series(tok.ravel()).str.contains(r"\d", regex=True).to_numpy().reshape(n, L)
    )


def _name_features(tok: np.ndarray, comma_end: np.ndarray, lens: np.ndarray) -> np.ndarray:
    n, L = tok.shape
    f = np.zeros((n, L, N_NAME_FEATS), dtype=np.float32)
    pos = np.arange(L)[None, :]
    f[..., 0] = 1.0
    f[..., 1] = np.isin(tok, _GIVEN_ARR)
    f[..., 2] = np.isin(tok, _SURNAME_ARR)
    f[..., 3] = np.isin(tok, _NICK_ARR)
    f[..., 4] = np.isin(tok, _HON_ARR)
    f[..., 5] = np.isin(tok, _SUF_ARR)
    f[..., 6] = np.char.str_len(tok) == 1
    f[..., 7] = pos == 0
    f[..., 8] = pos == (lens[:, None] - 1)
    after = np.zeros_like(comma_end)
    after[:, 1:] = comma_end[:, :-1]
    f[..., 9] = after
    f[..., 10] = _contains_digit(tok)
    f[..., 11] = np.isin(tok, _PART_ARR)
    return f


_ORDINAL_RE = r"^\d+(st|nd|rd|th)$"


def _addr_features(tok: np.ndarray, lens: np.ndarray) -> np.ndarray:
    n, L = tok.shape
    f = np.zeros((n, L, N_ADDR_FEATS), dtype=np.float32)
    pos = np.arange(L)[None, :]
    flat = pd.Series(tok.ravel())
    has_digit = flat.str.contains(r"\d", regex=True).to_numpy().reshape(n, L)
    has_alpha = flat.str.contains(r"[a-z]", regex=True).to_numpy().reshape(n, L)
    ordinal = flat.str.match(_ORDINAL_RE).to_numpy().reshape(n, L)
    f[..., 0] = 1.0
    f[..., 1] = has_digit & ~has_alpha
    f[..., 2] = np.isin(tok, _DIR_ARR)
    f[..., 3] = np.isin(tok, _STYPE_ARR)
    umark = np.isin(tok, _UMARK_ARR) | np.char.startswith(tok, "#")
    f[..., 4] = umark
    f[..., 5] = has_digit & has_alpha
    f[..., 6] = pos == 0
    f[..., 7] = pos == (lens[:, None] - 1)
    f[..., 8] = has_digit
    after = np.zeros_like(umark)
    after[:, 1:] = umark[:, :-1]
    f[..., 9] = after
    f[..., 10] = ordinal
    f[..., 11] = (np.char.str_len(tok) <= 2) & has_alpha & ~has_digit
    return f


# --------------------------------------------------------------------------
# linear-chain tagger: averaged structured perceptron + batch Viterbi
# --------------------------------------------------------------------------

def _viterbi(E: np.ndarray, trans: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Batch Viterbi: emissions E [n, L, T] + transitions [T+1, T] (last
    row = start) -> tags [n, L] (int8; padding = -1). One DP sweep over
    positions, every row of the batch decoded together."""
    n, L, T = E.shape
    trans = trans.astype(E.dtype, copy=False)
    transT = np.ascontiguousarray(trans[:-1].T)  # [cur, prev]
    V = trans[-1][None, :] + E[:, 0, :]  # [n, T]
    backs = np.zeros((n, L, T), dtype=np.int8)
    for t in range(1, L):
        # prev on the CONTIGUOUS last axis so argmax is a single fast pass
        scores = V[:, None, :] + transT[None, :, :]  # [n, cur, prev]
        bt = scores.argmax(axis=2)  # [n, cur] -> best prev
        Vn = np.take_along_axis(scores, bt[:, :, None], axis=2)[:, :, 0] + E[:, t, :]
        active = (t < lens)[:, None]
        V = np.where(active, Vn, V)  # freeze rows past their length
        backs[:, t, :] = bt
    tags = np.full((n, L), -1, dtype=np.int8)
    cur = V.argmax(axis=1)
    for t in range(L - 1, -1, -1):
        on = (lens - 1) >= t
        tags[on, t] = cur[on]
        if t > 0:
            prev = np.take_along_axis(backs[:, t, :], cur[:, None], axis=1)[:, 0]
            cur = np.where(on, prev, cur)
    return tags


class ChainTagger:
    """Emission weights W [n_feats, n_tags]; transitions T [n_tags+1, n_tags]
    (last row = start transitions). Decode is one DP sweep over token
    positions, vectorized over every row of the batch."""

    def __init__(self, n_feats: int, n_tags: int):
        self.n_feats, self.n_tags = n_feats, n_tags
        self.W = np.zeros((n_feats, n_tags), dtype=np.float64)
        self.T = np.zeros((n_tags + 1, n_tags), dtype=np.float64)

    def decode_batch(self, feats: np.ndarray, lens: np.ndarray) -> np.ndarray:
        """feats [n, L, F], lens [n] -> tags [n, L] (int8; padding = -1)."""
        return _viterbi(feats @ self.W, self.T, lens)

    def fit(
        self,
        feats: np.ndarray,
        gold: np.ndarray,
        lens: np.ndarray,
        epochs: int = 12,
        chunk: int = 64,
        seed: int = 7,
    ) -> float:
        """Averaged structured perceptron, mini-batch flavor: decode a chunk
        with the current weights, apply every mismatching sequence's update,
        snapshot into the running average. Returns final training accuracy
        (token-level, over real positions)."""
        n = feats.shape[0]
        rng = np.random.default_rng(seed)
        Wsum = np.zeros_like(self.W)
        Tsum = np.zeros_like(self.T)
        snaps = 0
        for _ in range(epochs):
            order = rng.permutation(n)
            for s in range(0, n, chunk):
                idx = order[s : s + chunk]
                fx, gx, lx = feats[idx], gold[idx], lens[idx]
                pred = self.decode_batch(fx, lx)
                for i in range(len(idx)):
                    Li = lens[idx[i]]
                    g, p = gx[i, :Li], pred[i, :Li]
                    if np.array_equal(g, p):
                        continue
                    x = fx[i, :Li]  # [Li, F]
                    for t in range(Li):
                        if g[t] != p[t]:
                            self.W[:, g[t]] += x[t]
                            self.W[:, p[t]] -= x[t]
                        pg = self.n_tags if t == 0 else g[t - 1]
                        pp = self.n_tags if t == 0 else p[t - 1]
                        if (pg, g[t]) != (pp, p[t]):
                            self.T[pg, g[t]] += 1.0
                            self.T[pp, p[t]] -= 1.0
                Wsum += self.W
                Tsum += self.T
                snaps += 1
        if snaps:
            self.W = Wsum / snaps
            self.T = Tsum / snaps
        pred = self.decode_batch(feats, lens)
        mask = np.arange(feats.shape[1])[None, :] < lens[:, None]
        return float((pred[mask] == gold[mask]).mean())


# --------------------------------------------------------------------------
# deterministic synthetic supervision
# --------------------------------------------------------------------------

def _rand_word(rng: np.random.Generator, lo: int = 4, hi: int = 9) -> str:
    k = int(rng.integers(lo, hi))
    return "".join(chr(97 + c) for c in rng.integers(0, 26, k))


def _synth_names(rng: np.random.Generator, n: int = 3500):
    """-> (token_lists, comma_end_lists, tag_lists). Adversarial templates
    (bare 'L F' orders) draw only from unambiguous lexicon tokens so the
    supervision is consistent; standard templates mix in OOV tokens so the
    positional prior survives off-lexicon names."""
    given_only = sorted(set(_GIVEN) - set(_SURNAME))
    sur_only = sorted(set(_SURNAME) - set(_GIVEN))
    nick_only = sorted(set(_NICK_KEYS) - set(_SURNAME))
    templates = (
        [("F", "L")] * 30
        + [("F", "M", "L")] * 14
        + [("L,", "F")] * 14
        + [("L,", "F", "M")] * 10
        + [("H", "F", "L")] * 8
        + [("H", "F", "M", "L")] * 4
        + [("F", "L", "S")] * 5
        + [("L,", "F", "M", "S")] * 3
        + [("H", "L", "F")] * 5      # 'dr smith john'
        + [("H", "L", "F", "M")] * 4  # 'dr smith john r'
        + [("F", "P", "L")] * 4      # particle surname
        + [("F", "P", "P", "L")] * 2
        + [("L", "F")] * 3           # bare adversarial order
    )
    toks, commas, tags = [], [], []
    for _ in range(n):
        tpl = templates[int(rng.integers(0, len(templates)))]
        adversarial = tpl in (("H", "L", "F"), ("H", "L", "F", "M"), ("L", "F"))
        seq_t, seq_c, seq_y = [], [], []
        for sym in tpl:
            comma = sym.endswith(",")
            base = sym.rstrip(",")
            if base == "F":
                if adversarial:
                    w = given_only[int(rng.integers(0, len(given_only)))]
                elif rng.random() < 0.25:
                    w = nick_only[int(rng.integers(0, len(nick_only)))]
                elif rng.random() < 0.12:
                    w = _rand_word(rng)
                else:
                    w = _GIVEN[int(rng.integers(0, len(_GIVEN)))]
                y = "FIRST"
            elif base == "L":
                if adversarial:
                    w = sur_only[int(rng.integers(0, len(sur_only)))]
                elif rng.random() < 0.12:
                    w = _rand_word(rng)
                else:
                    w = _SURNAME[int(rng.integers(0, len(_SURNAME)))]
                y = "LAST"
            elif base == "M":
                if rng.random() < 0.55:
                    w = chr(97 + int(rng.integers(0, 26)))
                else:
                    w = _GIVEN[int(rng.integers(0, len(_GIVEN)))]
                y = "MID"
            elif base == "H":
                w = _HONORIFICS[int(rng.integers(0, len(_HONORIFICS)))]
                y = "PRE"
            elif base == "S":
                w = _SUFFIXES[int(rng.integers(0, len(_SUFFIXES)))]
                y = "SUF"
            else:  # P — particle, part of the surname
                w = _PARTICLES[int(rng.integers(0, len(_PARTICLES)))]
                y = "LAST"
            seq_t.append(w)
            seq_c.append(comma)
            seq_y.append(_N_T[y])
        toks.append(seq_t)
        commas.append(seq_c)
        tags.append(seq_y)
    return toks, commas, tags


def _synth_addrs(rng: np.random.Generator, n: int = 3500):
    templates = (
        [("NUM", "SW", "TY")] * 26
        + [("NUM", "DIR", "SW", "TY")] * 10
        + [("NUM", "SW", "TY", "DIR")] * 5
        + [("NUM", "SW", "SW", "TY")] * 8
        + [("NUM", "SW")] * 5          # 'broadway' style, no type
        + [("NUM", "ORD", "TY")] * 8   # '100 5th ave'
        + [("NUM", "SW", "TY", "UM", "UI")] * 10
        + [("NUM", "SW", "TY", "UM", "UI", "UI")] * 3  # 'suite 100 b'
        + [("NUM", "SW", "TY", "HUI")] * 4             # '#4b'
        + [("UM", "UI", "NUM", "SW", "TY")] * 4        # leading unit
        + [("NUM", "DIR", "SW", "TY", "UM", "UI")] * 4
    )
    toks, tags = [], []
    for _ in range(n):
        tpl = templates[int(rng.integers(0, len(templates)))]
        seq_t, seq_y = [], []
        for sym in tpl:
            if sym == "NUM":
                w, y = str(int(rng.integers(1, 9999))), "NUM"
            elif sym == "DIR":
                w = _DIRECTIONALS[int(rng.integers(0, len(_DIRECTIONALS)))]
                y = "PREDIR"  # _fix_addr_dir_tags re-labels post-street ones
            elif sym == "SW":
                if rng.random() < 0.45:
                    w = _rand_word(rng)
                else:
                    w = _STREET_WORDS[int(rng.integers(0, len(_STREET_WORDS)))]
                y = "STREET"
            elif sym == "ORD":
                w = f"{int(rng.integers(1, 99))}{rng.choice(['st', 'nd', 'rd', 'th'])}"
                y = "STREET"
            elif sym == "TY":
                w, y = _STREET_TYPES[int(rng.integers(0, len(_STREET_TYPES)))], "POSTTYPE"
            elif sym == "UM":
                w, y = _UNIT_MARKERS[int(rng.integers(0, len(_UNIT_MARKERS)))], "UNITTYPE"
            elif sym == "UI":
                r = rng.random()
                if r < 0.4:
                    w = str(int(rng.integers(1, 999)))
                elif r < 0.7:
                    w = chr(97 + int(rng.integers(0, 26)))
                else:
                    w = f"{int(rng.integers(1, 99))}{chr(97 + int(rng.integers(0, 26)))}"
                y = "UNITID"
            else:  # HUI — '#4b'
                w = f"#{int(rng.integers(1, 99))}{chr(97 + int(rng.integers(0, 26)))}"
                y = "UNITID"
            seq_t.append(w)
            seq_y.append(_A_T[y])
        toks.append(seq_t)
        tags.append(seq_y)
    return toks, tags


def _fix_addr_dir_tags(toks, tags):
    """POSTDIR vs PREDIR from sequence position: a directional AFTER the
    street body is a post-directional. (The template generator above labels
    by template; this pass normalizes edge cases deterministically.)"""
    st_idx = {_A_T["STREET"], _A_T["POSTTYPE"]}
    for ts, ys in zip(toks, tags):
        seen_street = False
        for i, y in enumerate(ys):
            if y in st_idx:
                seen_street = True
            elif y in (_A_T["PREDIR"], _A_T["POSTDIR"]):
                ys[i] = _A_T["POSTDIR"] if seen_street else _A_T["PREDIR"]
    return tags


@lru_cache(maxsize=1)
def name_tagger() -> ChainTagger:
    rng = np.random.default_rng(42)
    toks, commas, tags = _synth_names(rng)
    tok, lens = _pad_tokens(toks, NAME_MAX_LEN)
    comma = np.zeros(tok.shape, dtype=bool)
    for i, cs in enumerate(commas):
        comma[i, : len(cs)] = cs[:NAME_MAX_LEN]
    gold = np.full(tok.shape, -1, dtype=np.int8)
    for i, ys in enumerate(tags):
        gold[i, : len(ys)] = ys[:NAME_MAX_LEN]
    feats = _name_features(tok, comma, lens)
    tg = ChainTagger(N_NAME_FEATS, len(NAME_TAGS))
    acc = tg.fit(feats, gold, lens)
    if acc < 0.985:  # guards feature/template drift at build time
        raise RuntimeError(f"name tagger training accuracy {acc:.4f} < 0.985")
    return tg


@lru_cache(maxsize=1)
def addr_tagger() -> ChainTagger:
    rng = np.random.default_rng(43)
    toks, tags = _synth_addrs(rng)
    tags = _fix_addr_dir_tags(toks, tags)
    tok, lens = _pad_tokens(toks, ADDR_MAX_LEN)
    gold = np.full(tok.shape, -1, dtype=np.int8)
    for i, ys in enumerate(tags):
        gold[i, : len(ys)] = ys[:ADDR_MAX_LEN]
    feats = _addr_features(tok, lens)
    tg = ChainTagger(N_ADDR_FEATS, len(ADDR_TAGS))
    acc = tg.fit(feats, gold, lens)
    if acc < 0.985:
        raise RuntimeError(f"address tagger training accuracy {acc:.4f} < 0.985")
    return tg


# --------------------------------------------------------------------------
# fast decode path: features once per UNIQUE token (pd.factorize), emissions
# composed directly — the dense [n, L, F] tensor (and every full-matrix
# np.char / np.isin pass) exists only on the tiny training set. Parity with
# the dense path is regression-tested (feats @ W == composed E).
# --------------------------------------------------------------------------

def _name_emissions(raw: np.ndarray, lens: np.ndarray, W: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """raw tokens [n, L] -> (emissions [n, L, T] float32, stripped tokens)."""
    n, L = raw.shape
    codes, uniq = pd.factorize(raw.ravel())
    codes = codes.reshape(n, L)
    u = np.asarray(uniq, dtype="<U32")
    us = np.char.strip(u, ".,")
    uf = np.zeros((len(u), N_NAME_FEATS), dtype=np.float32)
    uf[:, 1] = np.isin(us, _GIVEN_ARR)
    uf[:, 2] = np.isin(us, _SURNAME_ARR)
    uf[:, 3] = np.isin(us, _NICK_ARR)
    uf[:, 4] = np.isin(us, _HON_ARR)
    uf[:, 5] = np.isin(us, _SUF_ARR)
    uf[:, 6] = np.char.str_len(us) == 1
    uf[:, 10] = pd.Series(us).str.contains(r"\d", regex=True).to_numpy()
    uf[:, 11] = np.isin(us, _PART_ARR)
    Wf = W.astype(np.float32)
    E = (uf @ Wf)[codes]  # token-intrinsic features, one matmul per UNIQUE
    E += Wf[0][None, None, :]  # bias
    E[:, 0, :] += Wf[7]  # pos == 0
    E[np.arange(n), np.maximum(lens - 1, 0), :] += Wf[8]  # pos == len-1
    comma = np.char.endswith(u, ",")[codes]
    after = np.zeros_like(comma)
    after[:, 1:] = comma[:, :-1]
    E[after] += Wf[9]
    return E, us[codes]


def _addr_emissions(raw: np.ndarray, lens: np.ndarray, W: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    n, L = raw.shape
    codes, uniq = pd.factorize(raw.ravel())
    codes = codes.reshape(n, L)
    u = np.asarray(uniq, dtype="<U32")
    us = np.char.strip(u, ".,")
    flat = pd.Series(us)
    has_digit = flat.str.contains(r"\d", regex=True).to_numpy()
    has_alpha = flat.str.contains(r"[a-z]", regex=True).to_numpy()
    uf = np.zeros((len(u), N_ADDR_FEATS), dtype=np.float32)
    uf[:, 1] = has_digit & ~has_alpha
    uf[:, 2] = np.isin(us, _DIR_ARR)
    uf[:, 3] = np.isin(us, _STYPE_ARR)
    umark_u = np.isin(us, _UMARK_ARR) | np.char.startswith(us, "#")
    uf[:, 4] = umark_u
    uf[:, 5] = has_digit & has_alpha
    uf[:, 8] = has_digit
    uf[:, 10] = flat.str.match(_ORDINAL_RE).to_numpy()
    uf[:, 11] = (np.char.str_len(us) <= 2) & has_alpha & ~has_digit
    Wf = W.astype(np.float32)
    E = (uf @ Wf)[codes]
    E += Wf[0][None, None, :]
    E[:, 0, :] += Wf[6]
    E[np.arange(n), np.maximum(lens - 1, 0), :] += Wf[7]
    after = np.zeros((n, L), dtype=bool)
    after[:, 1:] = umark_u[codes][:, :-1]
    E[after] += Wf[9]
    return E, us[codes]


# --------------------------------------------------------------------------
# tag -> component assembly: single-token fast path (fancy index), Python
# join only over the rare multi-token rows (particle surnames, 2-token units)
# --------------------------------------------------------------------------

def _join_tagged(tok: np.ndarray, tagmat: np.ndarray, want: tuple[int, ...]) -> pd.Series:
    sel = np.isin(tagmat, np.asarray(want, dtype=np.int8))
    counts = sel.sum(axis=1)
    single = tok[np.arange(tok.shape[0]), sel.argmax(axis=1)]
    out = np.where(counts > 0, single, "").astype(object)
    multi = np.nonzero(counts > 1)[0]
    if len(multi):
        # multi-token components (street bodies, particle surnames):
        # object-dtype concat per COLUMN over just the multi rows —
        # W<=10 vector ops, never a per-row join loop
        sub_tok, sub_sel = tok[multi], sel[multi]
        acc = np.full(len(multi), "", dtype=object)
        for j in range(sub_tok.shape[1]):
            if not sub_sel[:, j].any():
                continue
            piece = np.where(sub_sel[:, j], sub_tok[:, j], "").astype(object)
            sep = np.where((acc != "") & (piece != ""), " ", "").astype(object)
            acc = acc + sep + piece
        out[multi] = acc
    s = pd.Series(out)
    return s.where(s != "", None)


def tag_names(texts: pd.Series, tg: ChainTagger | None = None) -> pd.DataFrame:
    """Decode a batch of raw person-name strings -> DataFrame(first, last,
    middle)."""
    tg = tg or name_tagger()
    raw, lens = _tokenize_matrix(texts, NAME_MAX_LEN)
    E, tok = _name_emissions(raw, lens, tg.W)
    tags = _viterbi(E, tg.T, np.maximum(lens, 1))
    tags[lens == 0] = -1
    return pd.DataFrame(
        {
            "first": _join_tagged(tok, tags, (_N_T["FIRST"],)),
            "last": _join_tagged(tok, tags, (_N_T["LAST"],)),
            "middle": _join_tagged(tok, tags, (_N_T["MID"],)),
        }
    )


def tag_addresses(texts: pd.Series, tg: ChainTagger | None = None) -> pd.DataFrame:
    """Decode a batch of raw street-address strings -> DataFrame(number,
    street, unit). street keeps PREDIR + STREET + POSTTYPE + POSTDIR raw
    tokens (score.py normalizes abbreviations Column-side); unit strips
    '#'/'-' for space/hyphen-insensitive comparison, matching the regex
    path's semantics."""
    tg = tg or addr_tagger()
    raw, lens = _tokenize_matrix(texts, ADDR_MAX_LEN)
    E, tok = _addr_emissions(raw, lens, tg.W)
    tags = _viterbi(E, tg.T, np.maximum(lens, 1))
    tags[lens == 0] = -1
    street = _join_tagged(
        tok, tags, (_A_T["PREDIR"], _A_T["STREET"], _A_T["POSTTYPE"], _A_T["POSTDIR"])
    )
    unit = _join_tagged(tok, tags, (_A_T["UNITID"],))
    unit = unit.str.replace(r"[ #-]", "", regex=True)
    unit = unit.where(unit.notna() & (unit != ""), None)
    return pd.DataFrame(
        {"number": _join_tagged(tok, tags, (_A_T["NUM"],)), "street": street, "unit": unit}
    )


# --------------------------------------------------------------------------
# Spark surface: struct-returning pandas UDFs (weights ride the closure)
# --------------------------------------------------------------------------

@lru_cache(maxsize=1)
def name_struct_udf():
    from pyspark.sql.functions import pandas_udf

    tg = name_tagger()  # train ONCE driver-side; weights ride the closure

    @pandas_udf("first string, last string, middle string")
    def _name_crf(s: pd.Series) -> pd.DataFrame:
        return tag_names(s, tg)

    return _name_crf


@lru_cache(maxsize=1)
def address_struct_udf():
    from pyspark.sql.functions import pandas_udf

    tg = addr_tagger()

    @pandas_udf("number string, street string, unit string")
    def _addr_crf(s: pd.Series) -> pd.DataFrame:
        return tag_addresses(s, tg)

    return _addr_crf
