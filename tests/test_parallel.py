"""GOP-parallel encoding: threaded chunks byte-equal the reference's
parallel_encode.sh workflow (chunked -sfr/-nfr -noeos + concatenation;
ref: parallel_encode.sh:35-75)."""
import os
import subprocess

from dsv2_tpu.utils import y4m
from dsv2_tpu.utils.packet import VideoMeta
from dsv2_tpu.parallel.gop import encode_gops_parallel

from test_batch import load


def test_threaded_gop_encode_matches_reference(fixtures_dir, ref_build,
                                               tmp_path):
    name = "tiny64x48_420_6f.y4m"
    rdr, frames = load(fixtures_dir, name)
    gop = 2

    meta = VideoMeta(width=rdr.w, height=rdr.h, subsamp=rdr.subsamp,
                     fps_num=rdr.fps[0], fps_den=rdr.fps[1],
                     aspect_num=rdr.aspect[0], aspect_den=rdr.aspect[1])

    def factory():
        from dsv2_tpu.cli import make_encoder, default_enc_opts
        return make_encoder(meta, default_enc_opts(qp=60, gop=gop))

    ours1 = encode_gops_parallel(frames, None, gop, factory, workers=1)
    ours4 = encode_gops_parallel(frames, None, gop, factory, workers=4)
    assert ours1 == ours4

    # reference driven exactly like parallel_encode.sh
    src = os.path.join(fixtures_dir, name)
    parts = []
    for k, s in enumerate(range(0, len(frames), gop)):
        o = tmp_path / ("chunk%d.dsv" % k)
        subprocess.run(
            [os.path.join(ref_build, "dsv2"), "e", "-y", "-inp=" + src,
             "-out=" + str(o), "-y4m=1", "-qp=60", "-gop=%d" % gop,
             "-sfr=%d" % s, "-nfr=%d" % gop, "-noeos=1"],
            check=True, capture_output=True)
        parts.append(o.read_bytes())
    from dsv2_tpu.utils.packet import encode_eos
    ref = b"".join(parts) + encode_eos()
    assert ours4 == ref


def test_lockstep_streams_match_sequential(fixtures_dir):
    """Lockstep-batched streams (vmapped wave HME + frame steps) must be
    byte-identical to sequential per-stream encoding."""
    from dsv2_tpu.parallel.dynbatch import encode_streams_lockstep

    name = "tiny64x48_420_6f.y4m"
    rdr, frames = load(fixtures_dir, name)
    gop = 2
    streams = [frames[i:i + gop] for i in range(0, len(frames), gop)]

    meta = VideoMeta(width=rdr.w, height=rdr.h, subsamp=rdr.subsamp,
                     fps_num=rdr.fps[0], fps_den=rdr.fps[1],
                     aspect_num=rdr.aspect[0], aspect_den=rdr.aspect[1])

    def factory():
        from dsv2_tpu.cli import make_encoder, default_enc_opts
        enc = make_encoder(meta, default_enc_opts(qp=60, gop=gop))
        enc.hme_backend = "wave"
        return enc

    # sequential oracle (host HME backend -> also cross-checks wave)
    seq = []
    for st in streams:
        enc = factory()
        enc.hme_backend = "host"
        chunks = []
        for fr in st:
            chunks.extend(enc.encode_frame(fr))
        seq.append(b"".join(chunks))

    # width=4 (3 streams padded to 4) so the traced vmapped programs are
    # shared with test_lockstep_mesh_sharded via dynbatch's module-level
    # jit cache — tracing the wave program dominates these tests' cost
    lock = encode_streams_lockstep(streams, factory, width=4)
    assert [len(x) for x in lock] == [len(x) for x in seq]
    assert lock == seq

    # pipelined grouping (2 batchers x 2 lanes, device flushes of group A
    # overlap host phases of group B) is a pure scheduling change — bytes
    # must be identical to the single-batcher and sequential runs
    grouped = encode_streams_lockstep(streams, factory, width=2, groups=2)
    assert grouped == seq


def test_parallel_decode_matches_sequential(fixtures_dir):
    """Lockstep GOP-parallel decode == sequential decode, frame for frame."""
    import io
    import numpy as np
    from dsv2_tpu.codec.decoder import decode_stream
    from dsv2_tpu.parallel.gop import decode_gops_parallel

    rdr, frames = load(fixtures_dir, "tiny64x48_420_6f.y4m")
    meta = VideoMeta(width=rdr.w, height=rdr.h, subsamp=rdr.subsamp,
                     fps_num=rdr.fps[0], fps_den=rdr.fps[1])

    def factory():
        from dsv2_tpu.cli import make_encoder, default_enc_opts
        return make_encoder(meta, default_enc_opts(qp=60, gop=2))

    enc = factory()
    chunks = []
    for fr in frames:
        chunks.extend(enc.encode_frame(fr))
    chunks.extend(enc.end_of_stream())
    data = b"".join(chunks)

    seq = [f for _, f in decode_stream(io.BytesIO(data))]
    par = decode_gops_parallel(io.BytesIO(data))
    assert len(par) == len(seq) == 6
    for a, b in zip(par, seq):
        for c in range(3):
            assert np.array_equal(a.view(c), b.view(c))


def test_lockstep_mesh_sharded(fixtures_dir):
    """Lockstep streams sharded over an 8-device mesh: still byte-equal."""
    import jax
    import numpy as np
    from jax.sharding import Mesh
    from dsv2_tpu.parallel.dynbatch import encode_streams_lockstep

    devs = jax.devices()
    if len(devs) < 4:
        import pytest
        pytest.skip("needs multi-device mesh")
    mesh = Mesh(np.array(devs[:4]), ("gop",))

    # gop=2/width=4 matches test_lockstep_streams_match_sequential so the
    # unsharded programs are already traced (dynbatch._fn_cache); only the
    # sharded variants trace anew here
    rdr, frames = load(fixtures_dir, "tiny64x48_420_6f.y4m")
    gop = 2
    streams = [frames[i:i + gop] for i in range(0, len(frames), gop)]

    meta = VideoMeta(width=rdr.w, height=rdr.h, subsamp=rdr.subsamp,
                     fps_num=rdr.fps[0], fps_den=rdr.fps[1],
                     aspect_num=rdr.aspect[0], aspect_den=rdr.aspect[1])

    def factory():
        from dsv2_tpu.cli import make_encoder, default_enc_opts
        enc = make_encoder(meta, default_enc_opts(qp=60, gop=gop))
        enc.hme_backend = "wave"
        return enc

    plain = encode_streams_lockstep(streams, factory, width=4)
    sharded = encode_streams_lockstep(streams, factory, width=4, mesh=mesh)
    assert plain == sharded
