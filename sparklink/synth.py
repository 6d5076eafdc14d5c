"""Deterministic synthetic transcript fixtures (FIXTURES.md schemas).

Mirrors the reference's labeled corpora — the ``True Id`` column of
``csv_example/csv_example_input_with_true_ids.csv`` and the shared
``unique_id`` of ``record_linkage_example/AbtBuy_*.csv`` — transposed onto
the transcripts data model mandated by BASELINE.json ``input_hint``:

    transcripts(conv_id string, turn_idx int, role string,
                text string, tool string, ts timestamp)

Entities have a template conversation; cluster members are noised copies
(casing, extra whitespace, unicode accents, token drops, digit typos — the
same noise classes the reference's ``preProcess`` removes,
``csv_example/csv_example.py:26-38``). Rows are emitted in shuffled order so
canonicalization's stable ``(conv_id, turn_idx)`` re-ordering is exercised.
Everything is seeded — same args, same bytes, no external data.
"""

from __future__ import annotations

import datetime as _dt
import itertools

import numpy as np
import pandas as pd

_VOCAB = (
    "account billing invoice payment refund order shipping tracking delivery address "
    "password login email profile settings upgrade plan subscription cancel renew "
    "error crash timeout latency retry server api endpoint token quota limit "
    "report export import dataset model training cluster node executor partition "
    "schedule meeting calendar reminder ticket agent support escalate resolve close"
).split()

_TOOLS = ["search", "lookup", "calculator", "db_query", "web_fetch", None, None, None]

_ACCENT = str.maketrans({"a": "á", "e": "é", "i": "í", "o": "ó", "u": "ú"})

_EPOCH = _dt.datetime(2025, 1, 1, tzinfo=_dt.timezone.utc)


def _scaled_vocab(scale: int) -> list[str]:
    """``scale=1`` -> the historical 51-word vocab (bit-identical fixtures —
    the rng stream only depends on population LENGTH, which is unchanged).
    ``scale>1`` -> each word spawns ``scale`` numbered variants, multiplying
    the template space. Why this knob exists: with the fixed 51-word vocab
    the number of DISTINCT-entity template collisions grows ~n² in entity
    count (at 80k entities, 327 normalized conversation texts span multiple
    true entities — measured), so the fixture's Bayes error, not pipeline
    quality, becomes the binding constraint on pairwise F1 at 10x bench
    scale. Real transcripts keep per-pair separability roughly constant as
    a corpus grows; ``vocab_scale`` restores that property for large-scale
    quality rows while leaving every historical fixture byte-identical."""
    if scale <= 1:
        return list(_VOCAB)
    return [w if i == 0 else f"{w}{i}" for w in _VOCAB for i in range(scale)]


def _template_conversation(rng: np.random.Generator, vocab: list[str]) -> list[tuple[str, str, str | None]]:
    """One entity's canonical conversation: list of (role, text, tool)."""
    n_turns = int(rng.integers(3, 13))
    turns = []
    for t in range(n_turns):
        role = "user" if t % 2 == 0 else "assistant"
        n_words = int(rng.integers(5, 14))
        words = list(rng.choice(vocab, size=n_words))
        if rng.random() < 0.5:
            words.append(str(int(rng.integers(100, 99999))))
        tool = None
        if role == "assistant" and rng.random() < 0.35:
            tool = str(rng.choice([t for t in _TOOLS if t]))
            role_out = "assistant"
        else:
            role_out = role
        turns.append((role_out, " ".join(words), tool))
    return turns


def _noise_text(text: str, rng: np.random.Generator, hard: bool) -> str:
    """Apply the reference noise classes; never changes token identity enough
    to defeat a correct pipeline (cluster-recoverable by design)."""
    words = text.split()
    out = []
    for w in words:
        r = rng.random()
        if hard and r < 0.06 and len(words) > 4:
            continue  # token drop
        if r < 0.15:
            w = w.upper()
        elif r < 0.25:
            w = w.capitalize()
        if rng.random() < 0.08:
            w = w.translate(_ACCENT)
        if hard and w.isdigit() and rng.random() < 0.3:
            digits = list(w)
            pos = int(rng.integers(0, len(digits)))
            digits[pos] = str(int(rng.integers(0, 10)))
            w = "".join(digits)
        out.append(w)
    sep = "  " if rng.random() < 0.2 else " "
    s = sep.join(out)
    if rng.random() < 0.1:
        s = '"' + s + '"'
    return s


def make_transcripts(
    n_entities: int = 300,
    seed: int = 42,
    big_cluster_every: int = 50,
    big_cluster_size: int = 40,
    two_sources: bool = False,
    vocab_scale: int = 1,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Return (transcripts, conv_truth) pandas frames.

    Cluster sizes drawn from a skewed distribution (1-8), with every
    ``big_cluster_every``-th entity inflated to ``big_cluster_size`` members
    to exercise block-size caps / salting (SURVEY.md §7 step 5).

    two_sources: record-linkage mode — exactly one member per source for
    matched entities (``record_linkage_example`` premise: no dupes within a
    source); adds a ``source`` column ('a'/'b').
    """
    rng = np.random.default_rng(seed)
    vocab = _scaled_vocab(vocab_scale)
    t_rows: list[tuple] = []
    truth_rows: list[tuple] = []
    conv_counter = itertools.count()
    for e in range(n_entities):
        entity_id = f"e{e:06d}"
        template = _template_conversation(rng, vocab)
        if two_sources:
            # ~70% of entities appear in both sources; rest in one only.
            both = rng.random() < 0.7
            members = [("a", False), ("b", True)] if both else [(str(rng.choice(["a", "b"])), False)]
        else:
            if big_cluster_every and e % big_cluster_every == big_cluster_every - 1:
                size = big_cluster_size
            else:
                size = int(rng.choice([1, 1, 1, 2, 2, 3, 3, 4, 5, 6, 7, 8]))
            members = [(None, i > 0) for i in range(size)]
        for source, noisy in members:
            cid = f"c{next(conv_counter):07d}"
            base_min = int(rng.integers(0, 500000))
            for turn_idx, (role, text, tool) in enumerate(template):
                out_text = _noise_text(text, rng, hard=True) if noisy else _noise_text(text, rng, hard=False) if rng.random() < 0.3 else text
                ts = _EPOCH + _dt.timedelta(minutes=base_min, seconds=30 * turn_idx)
                row = (cid, turn_idx, role, out_text, tool, ts)
                if two_sources:
                    row = row + (source,)
                t_rows.append(row)
            # unlabeled slice: literal "x" (csv_evaluation.py:28-29 protocol)
            label = "x" if rng.random() < 0.05 else entity_id
            trow = (cid, label) + ((source,) if two_sources else ())
            truth_rows.append(trow)
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"] + (["source"] if two_sources else [])
    transcripts = pd.DataFrame(t_rows, columns=cols)
    # emit shuffled so stable (conv_id, turn_idx) ordering is actually tested
    transcripts = transcripts.sample(frac=1.0, random_state=seed).reset_index(drop=True)
    tcols = ["conv_id", "true_entity_id"] + (["source"] if two_sources else [])
    conv_truth = pd.DataFrame(truth_rows, columns=tcols)
    return transcripts, conv_truth


def make_labeled_pairs(
    conv_truth: pd.DataFrame,
    transcripts: pd.DataFrame | None = None,
    seed: int = 42,
    n_pos: int = 150,
    n_neg: int = 150,
) -> pd.DataFrame:
    """Training labels replacing interactive ``console_label``
    (csv_example/csv_example.py:130): sampled match/distinct pairs derived
    from gold, conv_id_a < conv_id_b (pair convention,
    mysql_example/mysql_example.py:260).

    Negatives mix random pairs with *blocked* hard negatives — distinct
    entities sharing a first-turn token — mirroring dedupe's
    ``prepare_training`` random+blocked sampling
    (csv_example/csv_example.py:115-120 [lib]); without hard negatives the
    classifier's decision boundary never sees near-miss pairs.
    """
    rng = np.random.default_rng(seed + 1)
    labeled = conv_truth[conv_truth.true_entity_id != "x"]
    by_entity = labeled.groupby("true_entity_id")["conv_id"].apply(list)
    pos = []
    for _, members in by_entity.items():
        if len(members) >= 2:
            for a, b in itertools.combinations(sorted(members), 2):
                pos.append((a, b, True))
    rng.shuffle(pos)
    pos = pos[:n_pos]
    ids = labeled.conv_id.to_numpy()
    ent = labeled.set_index("conv_id").true_entity_id
    neg: list[tuple] = []
    seen: set[tuple] = set()

    def add_neg(a: str, b: str) -> None:
        if ent[a] != ent[b]:
            a, b = sorted((a, b))
            if (a, b) not in seen:
                seen.add((a, b))
                neg.append((a, b, False))

    if transcripts is not None:
        # blocked negatives: pairs sharing a token of the first turn
        first = (
            transcripts.sort_values(["conv_id", "turn_idx"]).groupby("conv_id").first().reset_index()
        )
        first = first[first.conv_id.isin(set(ids))]
        tok_rows = []
        for cid, txt in zip(first.conv_id, first.text):
            for t in str(txt).lower().split()[:6]:
                tok_rows.append((t, cid))
        tok_df = pd.DataFrame(tok_rows, columns=["tok", "conv_id"])
        for _, grp in tok_df.groupby("tok"):
            members = grp.conv_id.unique()
            if 2 <= len(members) <= 30:
                for _ in range(min(3, len(members))):
                    a, b = rng.choice(members, size=2, replace=False)
                    if a != b:
                        add_neg(a, b)
            if len(neg) >= n_neg // 2:
                break
    while len(neg) < n_neg:
        a, b = rng.choice(ids, size=2, replace=False)
        add_neg(a, b)
    return pd.DataFrame(pos + neg, columns=["conv_id_a", "conv_id_b", "label"]).drop_duplicates(
        subset=["conv_id_a", "conv_id_b"]
    )


def write_fixture(
    spark, out_dir: str, n_entities: int = 300, seed: int = 42, two_sources: bool = False, vocab_scale: int = 1
) -> dict:
    """Materialize the fixture as parquet under out_dir; returns paths."""
    transcripts, conv_truth = make_transcripts(
        n_entities=n_entities, seed=seed, two_sources=two_sources, vocab_scale=vocab_scale
    )
    labeled = make_labeled_pairs(conv_truth, transcripts, seed=seed)
    paths = {}
    for name, pdf in [("transcripts", transcripts), ("conv_truth", conv_truth), ("labeled_pairs", labeled)]:
        p = f"{out_dir}/{name}.parquet"
        spark.createDataFrame(pdf).repartition(8).write.mode("overwrite").parquet(p)
        paths[name] = p
    return paths
