"""Deterministic synthetic corpus generator (FIXTURES.md F1/F2).

Produces, for a scale factor ``sf``:

- ``transcripts`` — the primary pipeline input per BASELINE.json
  ``input_hint``: (conv_id, turn_idx, role, text, tool, ts). Turn text
  carries seeded entity mentions and relation phrases; rows are shuffled
  on disk so the stable-ordering stage is exercised; a small set of
  "head" entities appears in a large fraction of turns (skew knob).
- ``ontology_terms`` — the linker dictionary (mirrors GOTerm,
  reference `src/BioOntologyKG/importers/import_go_obo.py:22-39`):
  canonical names, synonyms, misspelling variants, ambiguous aliases
  resolvable only by context embedding, alt_ids (same-as inputs),
  obsolete terms that must not link.

Everything is seed-stable and wall-clock-free: same (sf, seed) →
byte-identical tables in any process.
"""

from __future__ import annotations

import os
import random
from datetime import datetime, timedelta

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from bioontologykg_ray.functions.embedding import embed_text
from bioontologykg_ray import schemas

# Relation phrase → predicate (upper-cased on materialize, reference
# import_go_obo.py:256). INTERACTS_WITH / SAME_AS are symmetric
# (uniprot_intact.cql:31-40 precedent).
REL_PHRASES = {
    "is a": "IS_A",
    "is part of": "PART_OF",
    "regulates": "REGULATES",
    "interacts with": "INTERACTS_WITH",
    "is the same as": "SAME_AS",
}

# Surface-word pool: alias surfaces are `word(-word)*-<digits>`.
WORDS = [
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "theta", "kappa",
    "lambda", "sigma", "omega", "helix", "kinase", "ligand", "domain",
    "motif", "operon", "codon", "exon", "intron", "promoter", "enhancer",
    "receptor", "channel", "pathway",
]

# Filler vocab: plain words, no digits/dashes, and none of the relation
# phrase tokens (is/a/part/of/with/same/as) so no accidental triples.
FILLER = [
    "meanwhile", "please", "check", "report", "shows", "we", "observed",
    "notable", "results", "today", "thanks", "ok", "running", "output",
    "complete", "summary", "update", "context", "window", "details",
    "pending", "confirmed", "earlier", "finally",
]

# Regular facts never use SAME_AS — equivalences are generated ONLY by
# the deliberate chain rule below, so components stay small and
# meaningful (a random SAME_AS mix would create one giant component).
FACT_PHRASES = [p for p, pred in REL_PHRASES.items() if pred != "SAME_AS"]

NAMESPACES = ["entity_class_a", "entity_class_b", "entity_class_c"]
GENERATOR_VERSION = 3  # v3: + turn_ctx.parquet, import_nodes.tsv
BASE_TS = datetime(2025, 1, 1, 0, 0, 0)

# Structural constants (period choices are co-prime so features overlap)
OBSOLETE_EVERY = 29
ALT_ID_EVERY = 7
AMBIG_EVERY = 11
SAMEAS_CHAIN_EVERY = 13


def n_terms_for_sf(sf: float) -> int:
    return max(200, int(sf * 20_000))


def n_convs_for_sf(sf: float) -> int:
    return max(100, int(sf * 300_000))


def _term_name(i: int) -> str:
    return f"{WORDS[i % len(WORDS)]}-{i}"


def _term_synonym(i: int) -> str:
    return f"syn-{WORDS[(i * 3 + 1) % len(WORDS)]}-{i}"


def _term_misspelling(i: int) -> str:
    w = WORDS[i % len(WORDS)]
    return f"{w[0]}{w}-{i}"


def _ambig_alias(i: int, n_terms: int) -> str | None:
    """Every AMBIG_EVERY-th term shares an alias from a small pool."""
    if i % AMBIG_EVERY != 0:
        return None
    pool = max(5, n_terms // 50)
    return f"amb-{(i // AMBIG_EVERY) % pool}"


def make_ontology(sf: float, seed: int = 42, dim: int = schemas.EMBED_DIM) -> pa.Table:
    n = n_terms_for_sf(sf)
    term_ids, names, namespaces, definitions = [], [], [], []
    synonyms, xrefs, alt_ids, obsolete, embeddings = [], [], [], [], []
    for i in range(n):
        tid = f"ONT:{i:07d}"
        name = _term_name(i)
        # ctx-<i> is the disambiguation token: it appears in this term's
        # definition and in turns that mention this term via an ambiguous
        # alias, so embedding cosine resolves the alias (reference T6
        # kNN-resolution analogue).
        definition = f"definition ctx-{i} {WORDS[(i * 5 + 2) % len(WORDS)]} concept"
        syns = [_term_synonym(i), _term_misspelling(i)]
        amb = _ambig_alias(i, n)
        if amb is not None:
            syns.append(amb)
        term_ids.append(tid)
        names.append(name)
        namespaces.append(NAMESPACES[i % len(NAMESPACES)])
        definitions.append(definition)
        synonyms.append(syns)
        xrefs.append([f"XR:{i:05d}"])
        # alt_ids reference OTHER term ids → genuine same-as inputs for
        # canonicalization (FIXTURES.md F2). Pairs only; text-level
        # SAME_AS sentences add disjoint pairs too, so fixture components
        # stay size ≤3 — DEEP chains are exercised by the dedicated
        # chain/star union-find unit tests, not by this corpus.
        if i % ALT_ID_EVERY == 0 and i >= ALT_ID_EVERY and (i // ALT_ID_EVERY) % 2 == 1:
            alt_ids.append([f"ONT:{i - ALT_ID_EVERY:07d}"])
        else:
            alt_ids.append([])
        obsolete.append(i % OBSOLETE_EVERY == 0 and i > 0)
        embeddings.append(embed_text(f"{name} {definition}", dim))
    emb_arr = pa.FixedSizeListArray.from_arrays(
        pa.array(np.concatenate(embeddings).astype(np.float32)), dim
    )
    return pa.table(
        {
            "term_id": pa.array(term_ids, pa.string()),
            "name": pa.array(names, pa.string()),
            "namespace": pa.array(namespaces, pa.string()),
            "definition": pa.array(definitions, pa.string()),
            "synonyms": pa.array(synonyms, pa.list_(pa.string())),
            "xrefs": pa.array(xrefs, pa.list_(pa.string())),
            "alt_ids": pa.array(alt_ids, pa.list_(pa.string())),
            "is_obsolete": pa.array(obsolete, pa.bool_()),
            "embedding": emb_arr,
        }
    )


def _pick_surface(rng: random.Random, i: int, n_terms: int) -> tuple[str, bool]:
    """Choose a surface form for term i. Returns (surface, needs_ctx)."""
    r = rng.random()
    amb = _ambig_alias(i, n_terms)
    if amb is not None and r < 0.25:
        return amb, True
    if r < 0.50:
        return _term_name(i), False
    if r < 0.75:
        return _term_synonym(i), False
    return _term_misspelling(i), False


def _pick_term(rng: random.Random, n_terms: int) -> int:
    """Head-entity skew: terms 0..4 carry ~20% of all mentions."""
    if rng.random() < 0.20:
        return rng.randrange(0, min(5, n_terms))
    return rng.randrange(0, n_terms)


def _emit_conv(c: int, rng: random.Random, n_terms: int, cols) -> None:
    """Generate one conversation's turns into the six column lists.

    The rng call SEQUENCE here is the determinism contract: the legacy
    whole-corpus path replays it conv-after-conv from one seed, the
    chunked path replays it from a per-chunk seed — either way the same
    (path, seed) always yields the same bytes."""
    conv_ids, turn_idxs, roles, texts, tools, tss = cols
    conv_id = f"conv-{c:08d}"
    n_turns = 6 + (c % 5)
    conv_start = BASE_TS + timedelta(minutes=c)
    for t in range(n_turns):
        role = ("user", "assistant", "tool")[t % 3]
        parts = [rng.choice(FILLER) for _ in range(rng.randrange(2, 6))]
        n_facts = rng.choice((0, 1, 1, 2))
        for _ in range(n_facts):
            i = _pick_term(rng, n_terms)
            j = _pick_term(rng, n_terms)
            phrase = rng.choice(FACT_PHRASES)
            s_surf, s_ctx = _pick_surface(rng, i, n_terms)
            o_surf, o_ctx = _pick_surface(rng, j, n_terms)
            sent = f"{s_surf} {phrase} {o_surf}."
            parts.append(sent)
            # disambiguation context tokens for ambiguous aliases
            if s_ctx:
                parts.append(f"ctx-{i}")
            if o_ctx:
                parts.append(f"ctx-{j}")
            parts.append(rng.choice(FILLER))
        # same-as chains: link term k and k+1 explicitly in text
        if rng.random() < 0.05:
            k = rng.randrange(0, max(1, n_terms // SAMEAS_CHAIN_EVERY)) * SAMEAS_CHAIN_EVERY
            if k + 1 < n_terms:
                parts.append(f"{_term_name(k)} is the same as {_term_name(k + 1)}.")
        # occasional obsolete-term mention → must NOT link (dead-letter)
        if rng.random() < 0.04 and n_terms > OBSOLETE_EVERY:
            ob = rng.randrange(1, n_terms // OBSOLETE_EVERY) * OBSOLETE_EVERY
            parts.append(f"{_term_name(ob)} regulates {_term_name(_pick_term(rng, n_terms))}.")
        conv_ids.append(conv_id)
        turn_idxs.append(t)
        roles.append(role)
        texts.append(" ".join(parts))
        tools.append("search" if role == "tool" else "")
        tss.append(conv_start + timedelta(seconds=t * 30))


def _cols_to_table(cols) -> pa.Table:
    conv_ids, turn_idxs, roles, texts, tools, tss = cols
    return pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(turn_idxs, pa.int32()),
            "role": pa.array(roles, pa.string()),
            # large_string: 64-bit offsets — at sf16+ the corpus text
            # passes 2 GB and 32-bit-offset take()/concat overflows
            "text": pa.array(texts, pa.large_string()),
            "tool": pa.array(tools, pa.string()),
            "ts": pa.array(tss, pa.timestamp("us")),
        }
    )


def _shuffled(tbl: pa.Table, perm: np.ndarray) -> pa.Table:
    # chunked take: one giant take() concatenates its result into single
    # arrays, overflowing 32-bit string offsets past ~2 GB of text
    # (hit at sf16, 38.4M rows); per-chunk takes stay chunked
    CHUNK = 2_000_000
    n = tbl.num_rows
    if n <= CHUNK:
        return tbl.take(pa.array(perm))
    pieces = [
        tbl.take(pa.array(perm[i:i + CHUNK])) for i in range(0, n, CHUNK)
    ]
    return pa.concat_tables(pieces)


def make_transcripts(sf: float, seed: int = 42) -> pa.Table:
    n_convs = n_convs_for_sf(sf)
    n_terms = n_terms_for_sf(sf)
    rng = random.Random(seed)

    cols = ([], [], [], [], [], [])
    for c in range(n_convs):
        _emit_conv(c, rng, n_terms, cols)

    # shuffle rows on disk so ordering is NOT pre-sorted (FIXTURES.md F1)
    tbl = _cols_to_table(cols)
    perm = np.random.RandomState(seed).permutation(tbl.num_rows)
    return _shuffled(tbl, perm)


def make_transcripts_chunk(sf: float, seed: int, chunk: int,
                           n_chunks: int) -> pa.Table:
    """One shard of the LARGE-sf corpus: convs ``c % n_chunks == chunk``.

    Per-chunk rng seed → any chunk is generable independently of the
    others (embarrassingly parallel, bounded memory), at the cost that
    the large-sf byte stream differs from what the sequential path
    would emit — (sf, seed, generator version) → bytes is still fully
    deterministic, which is the actual fixture contract. Striding convs
    by ``c % n_chunks`` (not contiguous ranges) keeps every shard's
    conv ids and timestamps spread over the whole corpus, so shard-
    parallel reads see no time/id locality the real pipeline could
    exploit by accident."""
    n_convs = n_convs_for_sf(sf)
    n_terms = n_terms_for_sf(sf)
    rng = random.Random(seed * 1_000_003 + chunk)
    cols = ([], [], [], [], [], [])
    for c in range(chunk, n_convs, n_chunks):
        _emit_conv(c, rng, n_terms, cols)
    tbl = _cols_to_table(cols)
    perm = np.random.RandomState((seed * 7919 + chunk) % 2**32).permutation(
        tbl.num_rows
    )
    return _shuffled(tbl, perm)


def make_turn_ctx(tbl: pa.Table, dim: int = schemas.EMBED_DIM) -> pa.Table:
    """Per-turn context embeddings for turns that carry an ambiguous
    alias ('amb-' mention) — the ONLY turns whose embedding the linker
    ever consumes. This is the embedding model's output shipped as
    DATA: with it, the DuckDB oracle can verify the ambiguous-alias
    resolution (argmax over round(list_inner_product, 6)) and therefore
    the whole linked/canonical/node chain, while the model inference
    itself stays non-SQL. Rows are tiny (~3% of turns × dim floats)."""
    conv = tbl["conv_id"].to_pylist()
    turn = tbl["turn_idx"].to_pylist()
    texts = tbl["text"].to_pylist()
    c_out, t_out, e_out = [], [], []
    for c, t, x in zip(conv, turn, texts):
        if "amb-" in x:
            c_out.append(c)
            t_out.append(t)
            e_out.append(embed_text(x, dim))
    flat = (
        np.concatenate(e_out).astype(np.float32) if e_out else np.empty(0, np.float32)
    )
    return pa.table(
        {
            "conv_id": pa.array(c_out, pa.string()),
            "turn_idx": pa.array(t_out, pa.int32()),
            "ctx_emb": pa.FixedSizeListArray.from_arrays(pa.array(flat), dim),
        }
    )


def make_import_tsv(sf: float) -> str:
    """Headered TSV fixture for the declarative tabular importer
    (SURVEY §2: the reference's ~20 LOAD CSV scripts). Deliberately
    exercises: pipe-separated list column, empty→null numeric cast,
    code→label lookup, and DUPLICATE KEYS (~1.5 rows/key) so per-column
    merge policies (first / overwrite / concat) are observable.
    ``row_no`` is the explicit arrival order the merge policies use."""
    n = max(60, int(sf * 6000))
    n_keys = max(40, (2 * n) // 3)
    lines = ["row_no\tnode_id\tname\taliases\tweight\tflag"]
    for i in range(n):
        # stride must be coprime with n_keys or key coverage collapses
        # (e.g. n_keys divisible by 7 → only every 7th key exists and the
        # documented ~1.5 rows/key duplicate distribution breaks)
        stride = next(s for s in (7, 11, 13, 17, 19, 23) if n_keys % s)
        key = f"N{(i * stride) % n_keys:05d}"
        aliases = "|".join(f"al-{i}-{k}" for k in range(i % 3))
        weight = "" if i % 11 == 0 else str((i % 97) / 10)
        flag = ("Y", "N", "")[i % 3]
        lines.append(f"{i}\t{key}\tname-{key}-{i}\t{aliases}\t{weight}\t{flag}")
    return "\n".join(lines) + "\n"


def synth_dir(sf: float, root: str = "/tmp/biokg-ray-synth") -> str:
    return os.path.join(root, f"v{GENERATOR_VERSION}-sf{sf}")


# Above this many projected turns, ensure_synth switches from the
# sequential whole-corpus generator to per-chunk parallel workers.
# ~8 turns/conv average; 8M rows ≈ sf3.3. Below the threshold the
# legacy byte stream is preserved (cached small-sf fixture dirs and
# any test pins stay valid).
LARGE_GEN_ROWS = 8_000_000
_GEN_CHUNK_ROWS = 2_400_000  # ≈ sf1 per worker ≈ 1.3 GB RSS, ~30 s


def _gen_shard(args) -> int:
    """Spawn-pool worker: generate one chunk, write its transcript
    shard and its turn_ctx shard. Returns the shard's row count."""
    sf, seed, chunk, n_chunks, tdir, cdir, _dim = args
    tbl = make_transcripts_chunk(sf, seed, chunk, n_chunks)
    pq.write_table(tbl, os.path.join(tdir, f"part-{chunk:04d}.parquet"))
    pq.write_table(make_turn_ctx(tbl), os.path.join(cdir, f"ctx-{chunk:04d}.parquet"))
    return tbl.num_rows


def _ensure_synth_chunked(d: str, sf: float, seed: int, n_chunks: int) -> None:
    """Parallel large-sf generation: one worker per chunk (spawn
    context — safe even if the caller already holds a Ray session),
    each writing its own transcript shard; the small per-chunk
    turn_ctx tables are concatenated into the single turn_ctx.parquet
    the pipeline expects."""
    import multiprocessing as mp
    import shutil

    tdir = os.path.join(d, "transcripts")
    cdir = os.path.join(d, "_ctx_parts")
    os.makedirs(tdir, exist_ok=True)
    os.makedirs(cdir, exist_ok=True)
    procs = min(n_chunks, max(4, (os.cpu_count() or 8) - 4))
    jobs = [(sf, seed, c, n_chunks, tdir, cdir, schemas.EMBED_DIM)
            for c in range(n_chunks)]
    with mp.get_context("spawn").Pool(processes=procs) as pool:
        pool.map(_gen_shard, jobs, chunksize=1)
    ctx = pa.concat_tables(
        pq.read_table(os.path.join(cdir, f))
        for f in sorted(os.listdir(cdir))
    )
    pq.write_table(ctx, os.path.join(d, "turn_ctx.parquet"))
    shutil.rmtree(cdir, ignore_errors=True)


def ensure_synth(sf: float, seed: int = 42, root: str = "/tmp/biokg-ray-synth",
                 n_shards: int = 8, force_chunked: bool = False) -> str:
    """Write (once, idempotently) the synthetic corpus for ``sf``.

    Transcripts are sharded into ``n_shards`` parquet files so
    ``read_parquet`` parallelizes; a _DONE marker makes this re-entrant.
    Corpora projected past ``LARGE_GEN_ROWS`` turns are generated by
    parallel per-chunk workers (one shard per chunk) instead of one
    sequential pass — sf64 (153.6M turns) would otherwise take ~35 min
    and ~80 GB driver RSS in a single process. ``force_chunked`` exists
    for tests (exercise the chunked path at tiny sf).
    """
    d = synth_dir(sf, root)
    done = os.path.join(d, "_DONE")
    if os.path.exists(done):
        return d
    os.makedirs(os.path.join(d, "transcripts"), exist_ok=True)
    projected = n_convs_for_sf(sf) * 8  # mean(6..10) turns per conv
    if force_chunked or projected > LARGE_GEN_ROWS:
        n_chunks = max(n_shards, (projected + _GEN_CHUNK_ROWS - 1) // _GEN_CHUNK_ROWS)
        _ensure_synth_chunked(d, sf, seed, n_chunks)
    else:
        tbl = make_transcripts(sf, seed)
        shard = max(1, tbl.num_rows // n_shards + 1)
        for s in range(n_shards):
            sl = tbl.slice(s * shard, shard)
            if sl.num_rows == 0:
                break
            pq.write_table(sl, os.path.join(d, "transcripts", f"part-{s:04d}.parquet"))
        pq.write_table(make_turn_ctx(tbl), os.path.join(d, "turn_ctx.parquet"))
    pq.write_table(make_ontology(sf, seed), os.path.join(d, "ontology_terms.parquet"))
    with open(os.path.join(d, "import_nodes.tsv"), "w") as f:
        f.write(make_import_tsv(sf))
    with open(done, "w") as f:
        f.write("ok")
    return d
