"""Dynamic device-call batching for lockstep multi-stream encoding.

N per-GOP encoder threads run the unmodified per-frame pipeline; whenever a
thread reaches a device dispatch (motion search, frame encode step) it
submits (key, builder, args) here and blocks. When every running thread is
blocked on a submission, the last one to block becomes the flusher: for each
distinct key it stacks the queued argument trees (padding with copies of
lane 0 up to the fixed batch width so each program compiles exactly once),
runs ONE vmapped dispatch, and hands each thread its lane of the output.

This turns the reference's process-per-GOP parallelism
(parallel_encode.sh:35-75) into single-process, single-device lockstep
batching: the host logic stays byte-exact per stream while the device sees
full-width batches. Results are bit-identical to sequential encoding
because vmap only adds a batch axis to the integer programs.
"""
import threading

import numpy as np
import jax

# (key, width, sharding) -> jit(vmap(program)). Module-level so the (slow)
# vmap trace of the big search/step graphs happens once per PROCESS, not
# once per batcher: a bench or CLI run that builds a fresh batcher would
# otherwise re-trace (~30 s for the wave-HME graph) and re-load the
# compiled executable on its first flush.
_fn_cache = {}
_fn_lock = threading.Lock()


def _leaf_bytes(x):
    """Device-side: one output leaf -> its little-endian byte image."""
    import jax.numpy as jnp
    if x.dtype == jnp.bool_:
        x = x.astype(jnp.uint8)
    x = x.reshape(-1)
    if x.dtype.itemsize == 1:
        return jax.lax.bitcast_convert_type(x, jnp.uint8)
    return jax.lax.bitcast_convert_type(x, jnp.uint8).reshape(-1)


def _sig(tree):
    """Shape/dtype signature of a pytree (works on arrays and tracers).
    Dtypes are canonicalized so the host-side signature of an int64/
    float64 input matches what the trace sees with x64 disabled."""
    return tuple(
        (tuple(x.shape), jax.dtypes.canonicalize_dtype(x.dtype).name)
        for x in jax.tree_util.tree_leaves(tree))


def _make_packed_fn(vfn, fetch):
    """Wrap the vmapped program so every host-read output leaf lands in
    ONE contiguous uint8 buffer: the tunnel charges a full round-trip per
    d2h transfer (~6-30 ms), so fetching a dozen small leaves one
    np.asarray at a time costs more than the device compute of the whole
    flush. Selected leaves are byte-packed inside the jit (descending
    itemsize, so every view on the host stays aligned); everything else
    stays device-resident and flows to the next flush as LaneRefs.

    fetch: None -> every leaf <= 1 MB of the BATCHED output (legacy
    heuristic); True/False -> all/none; callable -> maps the
    ShapeDtypeStruct output tree to a same-structure tree of bools.

    The leaf selection is decided at trace time (inside the jit trace, so
    the expensive program trace happens exactly once) and recorded per
    input signature; _unpack_out reads it back after the call."""
    import jax.numpy as jnp
    meta = {}

    def wfn(*args):
        out = vfn(*args)
        ls, treedef = jax.tree_util.tree_flatten(out)
        leaves_sd = [jax.ShapeDtypeStruct(l.shape, l.dtype) for l in ls]
        if fetch is None:
            sel = [int(np.prod(l.shape, dtype=np.int64))
                   * np.dtype(l.dtype).itemsize <= (1 << 20)
                   for l in leaves_sd]
        elif isinstance(fetch, bool):
            sel = [fetch] * len(leaves_sd)
        else:
            sds = jax.tree_util.tree_unflatten(treedef, leaves_sd)
            sel = [bool(s) for s in jax.tree_util.tree_leaves(fetch(sds))]
            assert len(sel) == len(leaves_sd)
        order = sorted((i for i, s in enumerate(sel) if s),
                       key=lambda i: -np.dtype(leaves_sd[i].dtype).itemsize)
        meta[_sig(args)] = (treedef, leaves_sd, sel, order)
        packed = (jnp.concatenate([_leaf_bytes(ls[i]) for i in order])
                  if order else None)
        rest = [ls[i] for i in range(len(ls)) if not sel[i]]
        return packed, rest

    return jax.jit(wfn), meta


def _unpack_out(bufnp, rest, meta):
    """Rebuild the full output tree: packed leaves as np views over the
    single fetched buffer, unselected leaves as the device arrays."""
    treedef, leaves_sd, sel, order = meta
    leaves = [None] * len(leaves_sd)
    off = 0
    for i in order:
        sd = leaves_sd[i]
        dt = np.dtype(sd.dtype)
        nb = int(np.prod(sd.shape, dtype=np.int64)) * dt.itemsize
        raw = bufnp[off:off + nb]
        leaves[i] = (raw.view(np.bool_) if dt == np.bool_
                     else raw.view(dt)).reshape(sd.shape)
        off += nb
    it = iter(rest)
    for i in range(len(leaves_sd)):
        if not sel[i]:
            leaves[i] = next(it)
    return jax.tree_util.tree_unflatten(treedef, leaves)


class LaneRef:
    """Lane i of a batched device array, materialized lazily.

    Device-resident chain state (recon planes, pyramids) flows from one
    flush's output straight into the next flush's input. Slicing real
    rows out per lane and re-stacking them would cost dozens of eager
    device dispatches per flush on a high-RTT link; instead lanes carry
    LaneRefs, and the flusher passes the PARENT batch through untouched
    when the lanes line up (the common lockstep case)."""

    __slots__ = ("parent", "i")

    def __init__(self, parent, i):
        self.parent = parent
        self.i = i

    @property
    def shape(self):
        return self.parent.shape[1:]

    @property
    def dtype(self):
        return self.parent.dtype

    def __array__(self, dtype=None, copy=None):
        a = np.asarray(self.parent[self.i])
        return a.astype(dtype) if dtype is not None else a


def _lane_slice(a, i):
    """Distribute one output leaf to lane i (device leaves stay lazy)."""
    if isinstance(a, np.ndarray) or not hasattr(a, "devices"):
        return a[i]
    return LaneRef(a, i)


def _stack_lanes(*xs):
    """Stack one input leaf across lanes; LaneRef rows that line up with
    their parent batch pass the parent through with zero device work."""
    x0 = xs[0]
    if isinstance(x0, LaneRef):
        parent = x0.parent
        n = len(xs)
        if (all(isinstance(x, LaneRef) and x.parent is parent for x in xs)
                and [x.i for x in xs] == list(range(n))
                and parent.shape[0] == n):
            return parent
        import jax.numpy as jnp
        if all(isinstance(x, LaneRef) and x.parent is parent for x in xs):
            return jnp.take(parent, np.array([x.i for x in xs], np.int32),
                            axis=0)
        return jnp.stack([jnp.asarray(x.parent[x.i])
                          if isinstance(x, LaneRef) else jnp.asarray(x)
                          for x in xs])
    return np.stack(xs)


class LockstepBatcher:
    def __init__(self, width, mesh=None):
        """width: padded batch width. mesh: optional jax.sharding.Mesh with
        a leading "gop" axis — lanes (streams) shard across its devices, so
        N chips each run their own streams' search/transform inside ONE
        SPMD program (the multi-chip form of the reference's process-per-GOP
        parallelism)."""
        self.width = width            # padded batch width
        self.mesh = mesh
        self._sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            self._sharding = NamedSharding(mesh, PartitionSpec("gop"))
        self._cond = threading.Condition()
        self._active = 0
        self._blocked = 0
        self._queues = {}             # key -> list of [args, out, done]
        self._seq = 0                 # global submission counter

    def thread_begin(self):
        with self._cond:
            self._active += 1

    def thread_done(self):
        with self._cond:
            self._active -= 1
            if self._blocked and self._blocked >= self._active:
                self._flush_locked()

    def submit(self, key, builder, args, post=None, fetch=None):
        """Queue one lane; returns this lane's slice of the batched output.
        key = (kind, cfg) — cfg must be hashable and identical for lanes
        batched together. builder(cfg) -> single-example callable.
        post(batched_out) -> batched_out runs once per flushed batch (e.g.
        merged prefix fetches of big device outputs).
        fetch selects which output leaves the host reads (see
        _make_packed_fn); the first submission of a key fixes it."""
        entry = [args, None, False]
        with self._cond:
            self._seq += 1
            entry.append(self._seq)
            self._queues.setdefault(key, []).append(
                (entry, builder, post, fetch))
            self._blocked += 1
            if self._blocked >= self._active:
                self._flush_locked()
            while not entry[2]:
                self._cond.wait()
        if isinstance(entry[1], BaseException):
            raise entry[1]
        return entry[1]

    def _pick_queues(self):
        """Choose which queues to flush. Full-width queues flush as one
        aligned batch (the LaneRef parent-passthrough fast path). When
        every thread is blocked but no queue is full — streams drifted
        out of phase — release ONLY the queue holding the oldest
        submission: the stragglers advance, catch up with the group
        ahead, and the batches re-merge at full width (flushing
        everything instead locks the split in permanently and pads every
        half batch to full device cost)."""
        full = {k: v for k, v in self._queues.items()
                if len(v) >= self._active}
        if full:
            for k in full:
                del self._queues[k]
            return full
        oldest_key = min(self._queues,
                         key=lambda k: min(e[0][3] for e in
                                           self._queues[k]))
        return {oldest_key: self._queues.pop(oldest_key)}

    def _flush_locked(self):
        """Dispatch the selected queues (caller holds the lock and is one
        of the blocked threads)."""
        queues = self._pick_queues()
        n = sum(len(v) for v in queues.values())
        self._blocked -= n
        for key, pending in queues.items():
            try:
                # the first submission of a key fixes its fetch spec; a
                # lane submitting the same key with a different spec would
                # silently get the wrong host/device leaf split
                f0 = pending[0][3]
                if any(p[3] is not f0 for p in pending):
                    raise ValueError(
                        f"lockstep key {key[0]!r}: lanes submitted "
                        "different fetch specs")
                # NB: sharding is NOT part of the key — the same jit object
                # serves sharded and unsharded batches (sharding comes from
                # the device_put on the inputs below). jit re-lowers per
                # input sharding but reuses the traced jaxpr, and tracing
                # the wave program dominates (~60 s vs ~10 s deserialize).
                ck = (key, self.width)
                with _fn_lock:
                    ent = _fn_cache.get(ck)
                    if ent is None:
                        # jit AROUND the vmap: a bare vmap re-traces the
                        # whole program through the batching machinery on
                        # every call (~1.5 s of host time for the wave-HME
                        # graph); jit caches that trace after the first
                        # flush
                        ent = _make_packed_fn(
                            jax.vmap(pending[0][1](key[1])),
                            pending[0][3])
                        _fn_cache[ck] = ent
                fn, meta = ent
                import os
                import time as _time
                from ..utils.trace import stage as _stage
                kname = key[0] if isinstance(key, tuple) else "?"
                _t0 = _time.perf_counter()
                with _stage(f"lockstep.stack.{kname}"):
                    lanes = [e[0] for e, *_ in pending]
                    lanes += [lanes[0]] * (self.width - len(lanes))
                    stacked = jax.tree_util.tree_map(
                        _stack_lanes, *lanes,
                        is_leaf=lambda x: isinstance(x, LaneRef))
                    if self._sharding is not None:
                        stacked = jax.tree_util.tree_map(
                            lambda a: jax.device_put(a, self._sharding),
                            stacked)
                with _stage(f"lockstep.dispatch.{kname}"):
                    packed, rest = fn(*stacked)
                with _stage(f"lockstep.run.{kname}"):
                    # ONE bulk d2h per flush: every host-read leaf was
                    # byte-packed into `packed` inside the jit (a device
                    # tunnel charges per-transfer RTT); everything else
                    # stays device-resident and is handed out as LaneRefs
                    bufnp = (np.asarray(packed) if packed is not None
                             else None)
                    out = _unpack_out(bufnp, rest, meta[_sig(stacked)])
                with _stage(f"lockstep.post.{kname}"):
                    post = pending[0][2]
                    if post is not None:
                        out = post(out)
                for i, (e, *_) in enumerate(pending):
                    e[1] = jax.tree_util.tree_map(
                        lambda a, i=i: _lane_slice(a, i), out)
                    e[2] = True
                if os.environ.get("DSV2_FLUSHLOG"):
                    print(f"[flush] {kname:12s} {_time.perf_counter()-_t0:7.3f}s"
                          f" @ {_time.perf_counter():.3f}", flush=True)
            except BaseException as exc:  # propagate to every waiter
                for e, *_ in pending:
                    e[1] = exc
                    e[2] = True
        self._cond.notify_all()


def encode_streams_lockstep(stream_frames, enc_factory, width=None,
                            mesh=None, groups=1):
    """Encode independent GOP streams concurrently with lockstep device
    batching; returns the per-stream byte chunks in order. Byte-identical
    to encoding each stream sequentially. With a mesh, lanes shard across
    its "gop" axis devices.

    groups > 1 pipelines the device: streams split contiguously into
    `groups` independent batchers of `width` lanes each. While group A's
    threads run their host phase (RC, motion entropy, packet assembly)
    after a flush, group B's flush executes on the device — hiding the
    per-flush host time that a single full-width batcher serializes
    behind every dispatch. Same jit cache (keyed on per-group width), so
    the groups share compiled programs; results are byte-identical
    because scheduling never affects per-stream math."""
    n = len(stream_frames)
    if groups <= 1:
        return _encode_group(stream_frames, enc_factory, width or n, mesh)
    width = width or -(-n // groups)
    results = [None] * n
    errors = []

    def run_group(g):
        lo = g * width
        sf = stream_frames[lo:lo + width]
        if not sf:
            return
        try:
            results[lo:lo + len(sf)] = _encode_group(
                sf, enc_factory, width, mesh)
        except BaseException as exc:
            errors.append(exc)

    gthreads = [threading.Thread(target=run_group, args=(g,))
                for g in range(groups)]
    for t in gthreads:
        t.start()
    for t in gthreads:
        t.join()
    if errors:
        raise errors[0]
    return results


def _encode_group(stream_frames, enc_factory, width, mesh):
    n = len(stream_frames)
    batcher = LockstepBatcher(width, mesh=mesh)
    results = [None] * n
    errors = []

    def run(i):
        batcher.thread_begin()
        try:
            enc = enc_factory()
            enc.dev_submit = batcher.submit
            chunks = []
            for fr in stream_frames[i]:
                chunks.extend(enc.encode_frame(fr))
            results[i] = b"".join(chunks)
        except BaseException as exc:
            errors.append(exc)
        finally:
            batcher.thread_done()

    threads = [threading.Thread(target=run, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errors:
        raise errors[0]
    return results
