"""Multi-stream online serving wrapper.

Production deployment runs many camera streams per chip. A single stream
ticks at ~1.9 ms (~515 fps) while batching raises aggregate throughput to
~822 fps at B=4 and **~1248 fps at B=8** on a v5e (device-resident
inputs; round-4: one-hot memory write + auto space-to-depth stem;
round-5: s2d-packed ingestion + dual-branch head batching + pinned
frame-buffer layout) — so the server packs up to ``max_streams`` live
videos into one batched jitted step and keeps a per-stream temporal
memory slot (the fixed-shape ring buffer makes per-stream reset a pure
masked write: no recompilation when streams attach/detach mid-flight).

Per-chip stream count has a measured knee at **B=8** (see
``tools/serving_sweep.py``; round-4 sweep: B=8/12/16 →
1059/906/891 aggregate fps) — past 8 the router chain's f32
intermediates spill VMEM (``router_chain_bf16`` auto-enables there but
only softens it). To serve more cameras, hold B=8 per chip and widen
the mesh (``StreamingServer(mesh=...)`` shards streams over the data
axis).

The reference has no serving stack (SURVEY.md §2.8: inference = offline
scripts); this is a TPU-native addition for the online use case the model
was designed for (frame-by-frame video with carried state).
"""

from __future__ import annotations

import time
from collections import deque
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import Config
from .geometry import Lane, decode_kept_rows
from .models import PHNet
from .models.phnet import MemoryState, init_memory


def pack_frame_np(frame: np.ndarray, mode: str, h: int, w: int):
    """Host-side stem layout of one [H, W, 3] frame (or a passthrough
    when it already has the packed shape): 'width' -> [H, W/2, 6] (free
    view), 's2d' -> [H/2, W/2, 12] (one small transpose copy; the native
    decoder emits this directly, ``data.native_loader.decode_clip_s2d``)."""
    shapes = {"s2d": (h // 2, w // 2, 12), "width": (h, w // 2, 6)}
    target = shapes[mode]
    f = np.asarray(frame)
    if f.shape[-2:] == target[-2:]:
        return f.reshape(target)
    f = f.reshape(h, w, 3)
    if mode == "s2d":
        return f.reshape(h // 2, 2, w // 2, 2, 3).transpose(
            0, 2, 1, 3, 4).reshape(target)
    return f.reshape(target)


def packed_frame_shape(mode, h, w):
    """(H', W', C') of a pre-packed frame, or (h, w, 3) for mode None."""
    return {"s2d": (h // 2, w // 2, 12), "width": (h, w // 2, 6),
            None: (h, w, 3), "none": (h, w, 3)}[mode]


def resolve_serving_ingest(mcfg, packed: bool = True):
    """The ONE place the serving ingestion layout is decided (used by
    StreamingServer, export, bench and the sweep): returns
    ``(model_config, mode)`` where mode is "s2d" / "width" / None.

    On TPU the "auto" stem resolves to s2d-packed ingestion for serving —
    the host (or the native decoder, ``data.native_loader.
    decode_clip_s2d``) emits [H/2, W/2, 12] frames and the device runs
    the 4x4/s1 stem with zero layout copies (measured B=8, 2026-08-21:
    1168.0 agg fps vs 1097.4 width-packed / 1061.7 in-graph s2d / 999.4
    conv7). An explicitly pinned stem is honored with its matching
    packing. ``packed=False`` (the mesh path) only resolves "auto".
    """
    import dataclasses as _dc

    bb = mcfg.backbone
    stem = bb.stem
    mode = None
    if bb.kind == "resnet":
        if stem == "auto":
            if jax.default_backend() == "tpu":
                stem = "space_to_depth" if packed else "width_packed"
                mode = "s2d" if packed else None
            else:
                stem = "conv7"
        elif packed and stem == "width_packed":
            mode = "width"
        elif packed and stem == "space_to_depth":
            mode = "s2d"
    if stem != bb.stem or mode:
        mcfg = _dc.replace(
            mcfg, packed_frames=mode or "none",
            backbone=_dc.replace(bb, stem=stem))
    return mcfg, mode


def compile_with_pinned_input(fn, args, argnums, donate_argnums=()):
    """Compile ``fn`` with an AUTO-layout Format on ``args[i]`` for each
    ``i`` in ``argnums`` and return ``(executable, new_args)`` — the
    pinned entries re-laid into the compiler's preferred device layout.

    XLA's preferred entry layout for a conv input is not the default
    row-major one (v5e: the packed frame batch wants
    ``major_to_minor=(1,2,3,0,4)``), so a default-layout device-resident
    input pays a relayout copy INSIDE every step (%copy.1000, 0.27 ms of
    the 6.63 ms B=8 serving tick, xplane 2026-08-21). Pinning moves the
    buffer itself into the preferred layout once. Falls back to plain
    ``jax.jit`` on backends without layout support; the compiled
    executable also accepts default-layout arrays (it relayouts on
    call), so callers never have to special-case.

    Re-laying an existing array is surprisingly treacherous on jax 0.9
    (see ``relayout``): both ``jax.device_put(x, fmt)`` and trivial
    jitted identities can take fast paths that match on sharding only
    and silently return the input's EXISTING layout, which the pinned
    executable then rejects (or re-copies) at call time. ``relayout``
    therefore compiles a layout-UNIQUE program (a transpose pair around
    an optimization_barrier whose jaxpr encodes the target
    major_to_minor, so no cache entry compiled for another layout can
    ever be returned for it) and verifies the executable's reported
    output formats before trusting it."""
    import jax as _jax

    if isinstance(argnums, int):
        argnums = (argnums,)
    try:
        from jax.experimental.layout import Format, Layout

        in_sh = [None] * len(args)
        for i in argnums:
            in_sh[i] = Format(Layout.AUTO)
        comp = _jax.jit(
            fn, donate_argnums=donate_argnums,
            in_shardings=tuple(in_sh)).lower(*args).compile()
        fmts = comp.input_formats[0]
        args = list(args)
        for i in argnums:
            args[i] = relayout(args[i], fmts[i])
        return comp, tuple(args)
    except Exception:  # pragma: no cover - backend-dependent
        return (_jax.jit(fn, donate_argnums=donate_argnums), tuple(args))


def _layout_unique_identity(x, fmt, salt):
    """An identity on ``x`` whose jaxpr encodes ``fmt``'s major_to_minor
    (transpose there and back around a barrier) AND a caller-supplied
    ``salt`` constant. The transposes keep compiled artifacts for
    different target layouts from aliasing each other; the barrier keeps
    jit's trivial-computation fast path (which ignores requested output
    layouts entirely) from engaging; and the salt forces a FRESH compile
    per build: an executable loaded from the persistent compilation
    cache reports the right ``output_formats`` itself, but the runtime
    arrays it produces carry DEFAULT layout metadata (observed live on
    jax 0.9, 2026-08-21), which the pinned step then rejects. A fresh
    compile costs ~0.7 s once per server/bench construction."""
    perm = tuple(int(d) for d in fmt.layout.major_to_minor)
    inv = tuple(int(i) for i in np.argsort(perm))
    y, _ = jax.lax.optimization_barrier(
        (jnp.transpose(x, perm), jnp.int32(salt)))
    return jnp.transpose(y, inv)


def _fresh_salt():
    import uuid

    return int(uuid.uuid4()) & 0x7FFFFFFF


def relayout(tree, fmts):
    """Re-lay a pytree of device arrays into ``fmts`` (a matching tree
    of ``Format``s) — see compile_with_pinned_input's docstring for why
    neither ``device_put`` nor a plain jitted identity can do this.
    Verifies the compiled executable's output formats AND the produced
    arrays' formats; raises on mismatch rather than silently serving a
    mislaid buffer."""
    salt = _fresh_salt()
    comp = jax.jit(
        lambda t: jax.tree_util.tree_map(
            lambda x, f: _layout_unique_identity(x, f, salt), t, fmts),
        out_shardings=fmts).lower(tree).compile()
    got_exec = jax.tree_util.tree_map(
        lambda f: f.layout, comp.output_formats)
    want = jax.tree_util.tree_map(lambda f: f.layout, fmts)
    if got_exec != want:
        raise RuntimeError(
            f"relayout compiled to {got_exec}, wanted {want}")
    out = comp(tree)
    got = jax.tree_util.tree_map(lambda a: a.format.layout, out)
    if got != want:
        raise RuntimeError(f"relayout produced {got}, wanted {want}")
    return out


class _PinnedScatter:
    """Frame-buffer scatter whose output stays in the pinned layout.

    Each rows-shape variant (bounded: rows are padded to powers of two
    ≤ max_streams) is lowered and compiled explicitly with the target
    Format on the donated buffer in AND out, the scatter body wrapped
    in ``_layout_unique_identity`` so the compiled artifact's cache
    identity encodes the layout, and the executable's reported output
    format verified before first use."""

    def __init__(self, fn, fmt):
        self._fn, self._fmt, self._compiled = fn, fmt, {}

    def __call__(self, buf, rows, idx):
        key = (rows.shape, str(rows.dtype))
        comp = self._compiled.get(key)
        if comp is None:
            fmt = self._fmt
            salt = _fresh_salt()

            def fn(b, r, i):
                return _layout_unique_identity(self._fn(b, r, i), fmt,
                                               salt)

            comp = jax.jit(
                fn, donate_argnums=(0,),
                in_shardings=(fmt, None, None), out_shardings=fmt,
            ).lower(buf, rows, idx).compile()
            got = comp.output_formats
            got = got[0] if isinstance(got, (tuple, list)) else got
            if got.layout != fmt.layout:
                raise RuntimeError(
                    f"pinned scatter compiled to {got.layout}, "
                    f"wanted {fmt.layout}")
            self._compiled[key] = comp
        return comp(buf, rows, idx)


class StreamingServer:
    """Batched frame-synchronous server for up to ``max_streams`` videos."""

    def __init__(
        self,
        cfg: Config,
        variables,
        max_streams: int = 4,
        memory_window: Optional[int] = None,
        mesh=None,
        pin_frame_layout: Optional[bool] = None,
    ):
        """``mesh``: optional ``jax.sharding.Mesh`` — streams are sharded
        over the ``data`` axis (params replicated), scaling aggregate
        serving throughput across chips with zero model change; each
        chip serves ``max_streams / data`` streams and the per-stream
        memory rides the same sharding, so attach/detach stays a masked
        write. The TPU-native answer to "more cameras": add chips to the
        mesh, not model surgery."""
        if cfg.model.head.router_chain_bf16 is None:
            # auto-resolve by batch: past the measured B=8 VMEM spill
            # point the f32 router-chain intermediates go superlinear
            # (serving sweep 2026-08-19: bf16 +13% at B=16, -7% at B=8)
            import dataclasses as _dc
            auto = max_streams > 8
            cfg = _dc.replace(cfg, model=_dc.replace(
                cfg.model, head=_dc.replace(
                    cfg.model.head, router_chain_bf16=auto)))
        self.cfg = cfg
        self.mcfg = cfg.model
        # pre-packed frame ingestion: the host lays each frame out for
        # the stem BEFORE the H2D (a production decoder writes pixels
        # anyway), so the device never pays a thin-channel layout copy.
        # Measured B=8 (v5e, 2026-08-21): s2d-packed 1168.0 agg fps vs
        # width-packed 1092.9 vs in-graph width_packed 1097.4 vs
        # in-graph s2d 1061.7 — the full space-to-depth input (12
        # contraction channels, 4x4/s1 conv, zero transposes anywhere)
        # is the best serving ingest, so "auto" resolves to it HERE
        # (training/whole-clip keep width_packed, whose packing is free
        # in-graph). Weights are identical across all stem forms.
        if mesh is not None and self.mcfg.packed_frames != "none":
            # the mesh path assembles full unpacked [S,1,H,W,3] batches;
            # a packed model would read garbage channel counts from them
            raise ValueError(
                "packed_frames is not supported with a mesh — pass an "
                "unpacked config (the mesh path ships full batches)")
        self.mcfg, self._packed = resolve_serving_ingest(
            self.mcfg, packed=mesh is None)
        self.model = PHNet(self.mcfg)
        self.max_streams = max_streams
        self.mesh = mesh
        if mesh is not None:
            from .parallel.mesh import batch_sharding, replicate_sharding

            if "data" not in mesh.axis_names:
                raise ValueError(
                    f"mesh needs a 'data' axis to shard streams over "
                    f"(got axes {mesh.axis_names})")
            data_size = mesh.shape["data"]
            if max_streams % data_size:
                raise ValueError(
                    f"max_streams={max_streams} must be divisible by the "
                    f"mesh data axis ({data_size})")
            self._bsh = batch_sharding(mesh)
            self._rep = replicate_sharding(mesh)
            variables = jax.device_put(variables, self._rep)
        self.update_variables(variables, _device_put=False)
        window = memory_window or (
            self.mcfg.memory.window if self.mcfg.memory.window > 0 else 64
        )
        self.window = window
        self.memory = self._put_batched(
            init_memory(self.mcfg, max_streams, window))
        # persistent device-resident frame batch: each tick transfers ONLY
        # the streams that produced a frame (compacted, padded to a power
        # of two for a bounded set of compile variants) and scatters them
        # into this buffer on device — a 1-active-of-8 tick ships one
        # frame, not max_streams mostly-zero ones. Slots without a new
        # frame this tick (inactive, or attached-but-skipping) keep their
        # stale buffer content; the jitted step restores those streams'
        # memory rows from the pre-step memory (see ``row_mask`` below), so
        # a skipped tick leaves a stream's temporal state untouched rather
        # than advancing it with re-detections of the stale frame. The mesh
        # path keeps the full-batch transfer: a scatter into a data-sharded
        # operand lowers to cross-shard traffic that costs more than the
        # H2D it saves.
        self._frames_dev = None
        if mesh is None:
            if self._packed:
                fdt = (jnp.bfloat16
                       if self.mcfg.compute_dtype == "bfloat16"
                       else jnp.float32)
                fshape = (max_streams, 1) + self._packed_hw()
            else:
                fdt = jnp.float32
                fshape = (max_streams, 1, self.mcfg.img_h,
                          self.mcfg.img_w, 3)
            self._frames_dev = jnp.zeros(fshape, fdt)
            self._scatter_fn = lambda buf, rows, sids: buf.at[sids].set(
                rows.astype(buf.dtype))
            self._scatter = jax.jit(self._scatter_fn, donate_argnums=(0,))
        # frame-buffer layout pinning: XLA's preferred entry layout for
        # the stem conv is NOT the default row-major one (on a v5e it
        # wants major_to_minor=(1,2,3,0,4) — stream dim second-minor,
        # channels minor), so a default-layout persistent frame buffer
        # pays a thin-channel relayout copy at the top of every tick
        # (%copy.1000, 0.27 ms of the 6.63 ms B=8 tick, xplane
        # 2026-08-21). Compiling the step with an AUTO input Format,
        # holding ``_frames_dev`` in the layout the compiler asks for,
        # and making the scatter emit that same layout deletes the copy:
        # the scatter's write pass does the tiling for free. Lazy (first
        # tick) because it needs the live (variables, memory, dyn)
        # structures; any failure falls back to the unpinned jit path.
        self._pin_frame_layout = (
            pin_frame_layout if pin_frame_layout is not None
            else (mesh is None and jax.default_backend() == "tpu"))
        self._pinned = None  # (structure_key, compiled_executable)
        self.active = np.zeros(max_streams, bool)
        # original-image decode geometry per stream
        self.stream_geo: List[Tuple[int, int]] = [(0, 0)] * max_streams
        # observability: rolling dispatch-wall window + lifetime counters
        # (the reference's only serving telemetry is testVIL's fps print;
        # a production tick loop needs p50/p99 and per-stream liveness)
        self._tick_wall = deque(maxlen=512)
        self._n_ticks = 0
        self._n_frames = 0
        self._frames_per_stream = np.zeros(max_streams, np.int64)

        def step(variables, frames, mem, row_mask, dyn):
            outs, new_mem = self.model.apply(
                variables, frames, None, train=False, initial_memory=mem,
                dyn_combined=dyn,
            )

            # streams with no new frame this tick keep their pre-step
            # memory rows: their batch slot held a stale (or zero) frame
            # whose re-detections must not advance their temporal state.
            # The ring counter (scalar leaves) still advances globally —
            # a skipped stream simply has an invalid hole at this window
            # position, exactly as if the frame were missed upstream.
            def sel(new, old):
                if jnp.ndim(new) == 0:
                    return new
                m = row_mask.reshape((-1,) + (1,) * (jnp.ndim(new) - 1))
                return jnp.where(m, new, old)

            out_mem = jax.tree_util.tree_map(sel, new_mem, mem)
            if isinstance(out_mem, MemoryState):
                # restoring the full pre-step mask row would, after ring
                # wraparound, leave a skipping stream's over-age entries at
                # this position marked valid forever — explicitly clear the
                # written ring slot so a skipped tick is a genuine hole.
                # (V3MemoryState carries only last-frame state, no ring:
                # restoring it wholesale IS the correct skip semantics.)
                pos = mem.t % out_mem.mask.shape[1]
                hole = jnp.where(row_mask[:, None],
                                 out_mem.mask[:, pos], False)
                out_mem = out_mem._replace(
                    mask=out_mem.mask.at[:, pos].set(hole))
            return outs.kept[0], outs.kept_valid[0], out_mem

        self._step_fn = step
        self._step = jax.jit(step, donate_argnums=(2,))

    def _ensure_pinned(self):
        """Build (or refresh) the layout-pinned compiled step for the
        current (variables, memory, dyn) structures. Returns the
        executable to dispatch this tick — the pinned one when valid,
        else the plain jit. See the ``pin_frame_layout`` comment in
        ``__init__`` for the why; a weight hot-swap that changes the
        param structure just re-pins on the next tick."""
        if not self._pin_frame_layout or self.mesh is not None:
            return self._step
        key = (jax.tree_util.tree_structure(self.variables),
               jax.tree_util.tree_structure(self.memory),
               jax.tree_util.tree_structure(self._dyn))
        if self._pinned is not None and self._pinned[0] == key:
            return self._pinned[1]
        try:
            from jax.experimental.layout import Format, Layout

            jitted = jax.jit(
                self._step_fn, donate_argnums=(2,),
                in_shardings=(None, Format(Layout.AUTO), None, None,
                              None))
            comp = jitted.lower(
                self.variables, self._frames_dev, self.memory,
                jnp.zeros(self.max_streams, bool), self._dyn).compile()
            fmt = comp.input_formats[0][1]
            self._frames_dev = relayout(self._frames_dev, fmt)
            self._scatter = _PinnedScatter(self._scatter_fn, fmt)
            self._pinned = (key, comp)
            return comp
        except Exception:  # pragma: no cover - backend-dependent
            # e.g. a backend without layout support: serve unpinned
            # (the compiled step accepts default-layout buffers too)
            self._pin_frame_layout = False
            self._pinned = None
            return self._step

    def _packed_hw(self):
        """(H', W', C') of a pre-packed frame for the active mode."""
        return packed_frame_shape(
            self._packed, self.mcfg.img_h, self.mcfg.img_w)

    def _pack_frame(self, frame):
        return pack_frame_np(frame, self._packed,
                             self.mcfg.img_h, self.mcfg.img_w)

    def update_variables(self, variables, _device_put: bool = True):
        """Swap the served weights (checkpoint hot-reload). Rebuilds the
        pre-combined DynamicConv weights (``self._dyn``) so the hoisted
        fast path never serves stale weights after a swap — assigning
        ``self.variables`` directly would silently keep the old combines.

        Hoisting rationale: the chain combines, c-major output
        permutation and compute-dtype casts are loop-invariant, and a
        tick is one jit call, so XLA re-runs all of it every tick
        otherwise (~0.3-0.4 ms of the B=8 tick, xplane 2026-08-21).
        Base LaneHead only — the other variants keep the in-graph
        precompute."""
        if _device_put and self.mesh is not None:
            variables = jax.device_put(variables, self._rep)
        self.variables = variables
        self._dyn = None
        h = self.mcfg.head
        if not h.propagate_priors and h.variant != "multi":
            try:
                from .models.dynamic_conv import combine_dynamic_params

                hp = variables["params"]["frame"]["head"]
                dt = (jnp.bfloat16 if self.mcfg.compute_dtype == "bfloat16"
                      else jnp.float32)
                self._dyn = tuple(
                    combine_dynamic_params(
                        hp[f"dyn_head_{s}"], h.fc_hidden_dim,
                        h.dyn_dim_factor, quantize=self.mcfg.quantize,
                        c_major=True, dtype=dt)
                    for s in range(h.refine_layers))
                if self.mesh is not None:
                    self._dyn = jax.device_put(self._dyn, self._rep)
                else:
                    self._dyn = jax.tree_util.tree_map(
                        jnp.asarray, self._dyn)
            except KeyError:
                self._dyn = None  # foreign param layout: in-graph fallback

    def _put_batched(self, tree):
        """Place a stream-batched pytree: leading-axis leaves sharded over
        the data axis, scalars (the ring counter) replicated. No mesh:
        default device placement."""
        if self.mesh is None:
            return jax.tree_util.tree_map(jnp.asarray, tree)
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(
                jnp.asarray(x),
                self._bsh if jnp.ndim(x) else self._rep),
            tree)

    # ------------------------------------------------------------------
    def attach(self, ori_img_h: int = 0, cut_height: int = 0) -> int:
        """Register a new stream; returns its slot id. The slot's memory is
        cleared by masking (no recompilation)."""
        free = np.nonzero(~self.active)[0]
        if len(free) == 0:
            raise RuntimeError("no free stream slots")
        sid = int(free[0])
        self.active[sid] = True
        self.stream_geo[sid] = (ori_img_h, cut_height)
        # a reused slot must not inherit the previous stream's frame count
        self._frames_per_stream[sid] = 0
        self._clear_slot(sid)
        return sid

    def detach(self, sid: int):
        self.active[sid] = False
        self._clear_slot(sid)

    def _clear_slot(self, sid: int):
        mask = np.array(self.memory.mask)
        mask[sid] = False
        if self.mesh is not None:
            # keep the mask on its data-axis sharding — a default-placed
            # replacement would change the jitted step's input shardings
            # and force a recompile
            new_mask = jax.device_put(mask, self._bsh)
        else:
            new_mask = jnp.asarray(mask)
        # _replace keeps this working for both memory layouts (ring-buffer
        # MemoryState and the V3 prior-propagation carry): each keys slot
        # validity on a leading-stream-dim `mask`
        self.memory = self.memory._replace(mask=new_mask)

    # ------------------------------------------------------------------
    def step_async(self, frames: Dict[int, np.ndarray]):
        """Dispatch one batched tick without forcing a device round-trip.

        Returns (kept, valid) device arrays; pass them (later) to
        :meth:`decode` so callers can pipeline ticks. The jitted step
        itself runs ~4.9 ms for 4 full-res streams (~8.5 ms for 8) on a
        v5e with device-resident inputs; note that the development
        environment's
        remote-TPU tunnel serializes host transfers per call, so
        per-tick wall latency there is RTT-bound and not representative
        of a locally attached chip.
        """
        mcfg = self.mcfg
        t0 = time.perf_counter()
        for sid in frames:
            assert self.active[sid], f"stream {sid} not attached"
        step_exec = self._step
        if self.mesh is not None:
            batch = np.zeros(
                (self.max_streams, 1, mcfg.img_h, mcfg.img_w, 3), np.float32)
            for sid, frame in frames.items():
                batch[sid, 0] = frame
            batch = jax.device_put(batch, self._bsh)
        else:
            # pin the frame-buffer layout (and the scatter feeding it)
            # BEFORE any scatter this tick — the pinned compile decides
            # the buffer's device layout
            step_exec = self._ensure_pinned()
            if frames:
                sids = list(frames.keys())
                k = len(sids)
                k_pad = 1 << (k - 1).bit_length()  # bounded compile variants
                if self._packed:
                    rows = np.empty((k_pad, 1) + self._packed_hw(),
                                    np.float32)
                    for i, sid in enumerate(sids):
                        rows[i, 0] = self._pack_frame(frames[sid])
                else:
                    rows = np.empty((k_pad, 1, mcfg.img_h, mcfg.img_w, 3),
                                    np.float32)
                    for i, sid in enumerate(sids):
                        rows[i, 0] = frames[sid]
                # pad rows repeat the last (sid, frame) pair: duplicate
                # scatter indices write identical values — a no-op
                rows[k:] = rows[k - 1]
                idx = np.asarray(sids + [sids[-1]] * (k_pad - k), np.int32)
                self._frames_dev = self._scatter(
                    self._frames_dev, jnp.asarray(rows), jnp.asarray(idx))
            batch = self._frames_dev
        row_mask = np.zeros(self.max_streams, bool)
        for sid in frames:
            row_mask[sid] = True
        row_mask = (jax.device_put(row_mask, self._bsh)
                    if self.mesh is not None else jnp.asarray(row_mask))
        kept, valid, self.memory = step_exec(
            self.variables, batch, self.memory, row_mask, self._dyn)
        self._tick_wall.append(time.perf_counter() - t0)
        self._n_ticks += 1
        self._n_frames += len(frames)
        for sid in frames:
            self._frames_per_stream[sid] += 1
        return kept, valid, list(frames.keys())

    def stats(self) -> Dict:
        """Serving telemetry: lifetime tick/frame counters, per-stream
        frames, and dispatch-wall percentiles over the last ≤512 ticks.
        Dispatch wall = host assembly + H2D + async dispatch (the device
        step itself overlaps the next tick unless the caller syncs)."""
        wall = np.array(self._tick_wall) * 1e3
        return {
            "ticks": self._n_ticks,
            "frames": self._n_frames,
            "active_streams": int(self.active.sum()),
            "frames_per_stream": self._frames_per_stream.tolist(),
            "dispatch_ms_p50": float(np.percentile(wall, 50)) if len(wall) else None,
            "dispatch_ms_p99": float(np.percentile(wall, 99)) if len(wall) else None,
        }

    def decode(self, kept, valid, sids) -> Dict[int, List[Lane]]:
        """Fetch + decode a tick dispatched by :meth:`step_async`."""
        spec = self.mcfg.lane
        kept = np.array(kept)
        valid = np.array(valid)

        results: Dict[int, List[Lane]] = {}
        for sid in sids:
            ori_h, cut = self.stream_geo[sid]
            results[sid] = decode_kept_rows(
                kept[sid][valid[sid]], spec, ori_img_h=ori_h, cut_height=cut)
        return results

    def step(self, frames: Dict[int, np.ndarray]) -> Dict[int, List[Lane]]:
        """Synchronous tick: dispatch + fetch + decode."""
        kept, valid, sids = self.step_async(frames)
        return self.decode(kept, valid, sids)
