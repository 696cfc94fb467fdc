"""Bucketed, static-shape batch pipeline with device prefetch.

Replaces the reference's tf.data graph (tfrecord_data_loader.py:54-109):
file-list shuffle -> interleave -> parse -> bucket_by_sequence_length with
hardcoded boundaries and batch sizes, pad_to_bucket_boundary, shuffle(64),
infinite repeat (train) / single pass (eval).

TPU-first rationale: every bucket boundary is a distinct STATIC shape, so
jit compiles one program per bucket and never re-specializes; padding to
the boundary makes batches reproducible shape keys.  A background thread
keeps `prefetch_depth` batches in flight onto the device (or mesh) so the
accelerator never waits on the host.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, List, Optional, Sequence, Tuple

import ml_dtypes
import numpy as np

from ..config import Config
from .shards import ShardReader
from ..utils.numerics import round_up
from . import shards_native


class Batch(tuple):
    """(audio (B,Tb,D,C), audiolen (B,), tokens (B,L), tokenlen (B,))"""


def bucket_of(featlen: int, boundaries: Sequence[int]) -> Optional[int]:
    """Index of the first boundary > featlen; None if beyond the last.

    Strict `<` matches tf.data bucket_by_sequence_length, whose hardcoded
    boundary/batch-size tables these configs mirror (a length exactly at a
    boundary belongs to the NEXT bucket; reference
    tfrecord_data_loader.py:73-83)."""
    for i, b in enumerate(boundaries):
        if featlen < b:
            return i
    return None


class BucketedLoader:
    """Iterate bucketed batches from ARSH shards.

    Train: shards shuffled each epoch, records shuffled within shards,
    repeats forever.  Eval: one deterministic pass, leftovers flushed as
    partial batches (like tf.data's final smaller batches).
    """

    def __init__(self, shard_files: Sequence[str], cfg: Config,
                 is_training: bool = True, seed: int = 0,
                 use_native: Optional[bool] = None,
                 part_index: int = 0, part_count: int = 1):
        if not shard_files:
            raise ValueError("no shard files given")
        if not 0 <= part_index < part_count:
            raise ValueError(f"part_index {part_index} outside "
                             f"[0, {part_count})")
        if part_count > 1 and not is_training:
            # eval flushes ragged partial batches that cannot be split
            # evenly across processes; eval drivers are single-process
            raise ValueError("multi-process partitioning is train-only")
        self.part_index, self.part_count = part_index, part_count
        self.files = list(shard_files)
        self.cfg = cfg
        self.is_training = is_training
        self.boundaries = (cfg.bucket_boundaries_train if is_training
                           else cfg.bucket_boundaries_eval)
        if cfg.audio_shards:
            # records are raw waveforms; keep the reference FRAME-unit
            # tables and convert: frames < b  <=>  samples < b*fstride +
            # flen, so padding to the converted boundary featurizes to
            # EXACTLY b frames — bucket membership and the model-side
            # shape keys match the feature-shard pipeline one for one
            from ..ops.frontend_host import frame_params
            flen, fstride = frame_params(cfg.sample_rate, cfg.frame_length,
                                         cfg.frame_step)
            self.boundaries = tuple(b * fstride + flen
                                    for b in self.boundaries)
        if cfg.audio_shards and cfg.online_speed_perturb and is_training:
            # bucket by the SLOWEST configured rate's output length so the
            # on-device resample still fits the bucket's padded buffer
            from ..ops.augmentation import worst_stretch_len
            self._len_key = (lambda n, _spec=cfg.online_speed_rates:
                             worst_stretch_len(n, _spec))
        else:
            self._len_key = lambda n: n
        self.batch_sizes = cfg.bucket_batch_sizes
        self.max_tokenlen = (cfg.max_tokenlen_train if is_training
                             else cfg.max_tokenlen_eval)
        self._rng = np.random.default_rng(seed)
        if use_native is None:
            use_native = shards_native.available()
        self.native = bool(use_native)
        # Host->device feed dtype.  When the compute dtype is bfloat16 the
        # first device-side op on feature batches is exactly
        # `audio.astype(bfloat16)` (models/las.py compute_cast), so casting
        # on the host instead is BIT-IDENTICAL (numpy/ml_dtypes and XLA both
        # round-to-nearest-even) while halving transfer bytes.  On tunneled
        # dev platforms that halves both the ~37 MB/s host->device feed time
        # and the platform client's per-transfer host-memory retention
        # (measured: RSS grows by exactly the bytes transferred; see
        # docs/OPERATIONS.md "Host memory").  Raw-audio shards are excluded:
        # there the on-device frontend consumes f32 waveforms BEFORE any
        # compute cast, so a host-side downcast would change numerics.
        self.feed_dtype = (ml_dtypes.bfloat16
                           if cfg.dtype == "bfloat16"
                           and not cfg.audio_shards
                           else np.float32)
        reader_cls = (shards_native.NativeShardReader if self.native
                      else ShardReader)
        self._readers = {f: reader_cls(f) for f in self.files}
        geoms = {(r.feat_dim, r.channels) for r in self._readers.values()}
        if len(geoms) > 1:  # mixed shapes would corrupt batch assembly
            raise ValueError(f"shards disagree on feature geometry: {geoms}")
        if not cfg.audio_shards:
            # Refuse a stage-flag mismatch HERE with a readable message:
            # model init sizes the first encoder layer from cfg.feat_dim,
            # so a shard/config disagreement otherwise surfaces deep in
            # the first forward as a cryptic einsum shape error (observed
            # live: preprocess --feat_dim 13 + train left at the default
            # 39 -> "Size of label 'u' ... does not match").
            (D, C), = geoms
            if D != cfg.feat_dim:
                raise ValueError(
                    f"shards carry feat_dim {D} but the config says "
                    f"{cfg.feat_dim}; pass the SAME --feat_dim to every "
                    "stage (preprocess/create_shards/train/test/decode) "
                    "or use --use_saved_config True on the trained dir")

    @property
    def num_records(self) -> int:
        return sum(len(r) for r in self._readers.values())

    def batches_per_epoch(self) -> int:
        """Optimizer steps per pass over the data, derived from per-bucket
        record counts and the bucket batch-size table (the reference
        hardcodes the equivalent number for ITS dataset: 2,619 for
        train-100+360 at batches [96, 48x8], train.py:107-110).  Training
        floors per bucket (partial batches carry across the epoch
        boundary); eval ceils (leftovers flush as partial batches)."""
        counts: dict = {}
        for r in self._readers.values():
            for i in range(len(r)):
                b = bucket_of(self._len_key(r.featlen(i)), self.boundaries)
                if b is not None:
                    counts[b] = counts.get(b, 0) + 1
        total = 0
        for b, c in counts.items():
            bs = self.batch_sizes[min(b, len(self.batch_sizes) - 1)]
            total += (c // bs) if self.is_training else -(-c // bs)
        # The floor-at-1 guard only makes sense for the infinite training
        # stream (a derived 0 would stall the epoch loop); for eval the
        # honest count is 0 when every record falls outside the buckets.
        return max(total, 1) if self.is_training else total

    def batch_size_for(self, padded_len: int) -> Optional[int]:
        """Configured batch size of the bucket that pads to `padded_len`
        (the loader's own boundary->batch-size rule, for callers that pad
        partial batches back up to one static shape)."""
        for i, b in enumerate(self.boundaries):
            if b == padded_len:
                return self.batch_sizes[min(i, len(self.batch_sizes) - 1)]
        return None

    def _record_stream(self) -> Iterator[Tuple]:
        """Yields (reader, index, featlen) without materializing records."""
        while True:
            # per-pass counter: the docstring promises drops for the
            # LATEST pass, and the training stream is infinite
            self.dropped = 0
            files = list(self.files)
            if self.is_training:
                self._rng.shuffle(files)
            for fn in files:
                r = self._readers[fn]
                order = np.arange(len(r))
                if self.is_training:
                    self._rng.shuffle(order)
                for i in order:
                    yield r, int(i), r.featlen(int(i))
            if not self.is_training:
                return

    def _token_pad(self, items) -> int:
        """Static token width for this batch: the batch max rounded up to
        token_pad_quantum (capped at max_tokenlen).  The reference runs
        dec_steps = max(tokenlen) per batch (las/las.py:246-249); rounding
        to a quantum keeps the number of distinct jit shapes per bucket
        small while skipping most of the wasted decoder scan steps."""
        if not self.cfg.per_bucket_tokenlen:
            return self.max_tokenlen
        q = max(1, self.cfg.token_pad_quantum)
        actual = max(r.tokenlen(i) for r, i, _ in items)
        actual = min(max(actual, 1), self.max_tokenlen)
        return min(self.max_tokenlen, round_up(actual, q))

    def _assemble(self, items, pad_frames: int) -> Batch:
        """Materialize one padded batch.  Native path: one memcpy per record
        straight from the shard mmap into the batch buffers.

        Multi-process (part_count > 1): every process streams the SAME
        deterministic sequence of global batches (identical seed =>
        identical shard/record order => identical bucket fills), so jit
        shape keys and collective schedules agree across hosts — but each
        process memcpy-assembles only its own contiguous row slice
        [part_index*B/P, (part_index+1)*B/P) of each global batch.  The
        token pad width is computed over the FULL item list first so all
        processes agree on the static decoder width.  Feeding goes
        through jax.make_array_from_process_local_data
        (trainer.make_mesh_train_step), which stitches the slices into
        one global device array along the 'data' mesh axis."""
        tok_width = self._token_pad(items)
        if self.part_count > 1:
            if len(items) % self.part_count:
                raise ValueError(
                    f"global batch {len(items)} not divisible by "
                    f"part_count {self.part_count}")
            rows = len(items) // self.part_count
            items = items[self.part_index * rows:
                          (self.part_index + 1) * rows]
        B = len(items)
        r0 = items[0][0]
        D, C = r0.feat_dim, r0.channels
        audio = np.zeros((B, pad_frames, D, C), np.float32)
        audiolen = np.zeros((B,), np.int32)
        toks = np.zeros((B, tok_width), np.int32)
        toklen = np.zeros((B,), np.int32)
        if self.native:
            for row, (r, i, _) in enumerate(items):
                T, L = r.read_into(i, audio[row], toks[row])
                audiolen[row] = T
                toklen[row] = L
        else:
            for row, (r, i, _) in enumerate(items):
                feat, tok = r.record(i)
                T = min(len(feat), pad_frames)
                L = min(len(tok), self.max_tokenlen)
                audio[row, :T] = feat[:T]
                audiolen[row] = T
                toks[row, :L] = tok[:L]
                toklen[row] = L
        if audio.dtype != self.feed_dtype:
            audio = audio.astype(self.feed_dtype)
        return Batch((audio, audiolen, toks, toklen))

    def __iter__(self) -> Iterator[Batch]:
        if self.is_training and not any(
                bucket_of(self._len_key(r.featlen(i)), self.boundaries)
                is not None
                for r in self._readers.values() for i in range(len(r))):
            # the infinite training stream would otherwise spin forever
            # waiting for a first batch that can never fill (observed as
            # train.py hanging silently on an empty/out-of-range corpus)
            raise ValueError(
                "training stream is empty: no record fits any bucket "
                f"({self.num_records} records, boundaries "
                f"{list(self.boundaries)}); check the shard files and "
                "--bucket_boundaries_train")
        buckets: List[List] = [[] for _ in self.boundaries]
        self.dropped = 0  # beyond-last-boundary utts in the latest pass
        for r, i, featlen in self._record_stream():
            b = bucket_of(self._len_key(featlen), self.boundaries)
            if b is None:
                self.dropped += 1
                continue  # drop beyond-last-boundary utts (TF raises; we drop)
            buckets[b].append((r, i, featlen))
            bs = self.batch_sizes[min(b, len(self.batch_sizes) - 1)]
            if len(buckets[b]) >= bs:
                items, buckets[b] = buckets[b], []
                yield self._assemble(items, self.boundaries[b])
        # flush leftovers (eval path)
        for b, items in enumerate(buckets):
            if items:
                yield self._assemble(items, self.boundaries[b])


class DevicePrefetcher:
    """Background thread that stages host batches onto the device/mesh,
    keeping `depth` batches in flight (double buffering)."""

    def __init__(self, it, put_fn, depth: int = 2):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._sentinel = object()
        self._err: Optional[BaseException] = None
        self._stop = threading.Event()
        self._done = False

        def worker():
            try:
                for item in it:
                    staged = put_fn(item)
                    # bounded put so close() can always unblock the thread
                    while not self._stop.is_set():
                        try:
                            self._q.put(staged, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    if self._stop.is_set():
                        return
            except BaseException as e:  # propagate into consumer
                self._err = e
            finally:
                # blocking (but interruptible) put: the sentinel must not
                # be dropped when the queue is momentarily full, or a
                # finite stream's consumer waits forever
                while not self._stop.is_set():
                    try:
                        self._q.put(self._sentinel, timeout=0.1)
                        break
                    except queue.Full:
                        continue

        self._t = threading.Thread(target=worker, daemon=True)
        self._t.start()

    def __iter__(self):
        return self

    def __next__(self):
        if self._done:  # exhausted streams stay exhausted (no deadlock on
            raise StopIteration  # a second pass; __iter__ returns self)
        item = self._q.get()
        if item is self._sentinel:
            self._done = True
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item

    def close(self):
        """Stop the worker and release staged device batches.  Call when
        abandoning the stream early (e.g. train.py hitting total_steps on
        an infinite loader) so `depth` mesh-resident batches don't stay
        pinned in HBM for the rest of the process."""
        self._stop.set()
        while True:  # drain so a blocked put can finish and see the stop
            try:
                self._q.get_nowait()
            except queue.Empty:
                break
        self._t.join(timeout=5.0)
        while True:  # drop anything staged between the drain and exit
            try:
                self._q.get_nowait()
            except queue.Empty:
                break
        self._done = True

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
