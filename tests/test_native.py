"""Native (C++) component tests: DM decoder parity vs the Python decoder,
and the scopectl daemon end-to-end over a real socket."""

import os
import subprocess
import time

import numpy as np
import pytest

NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
BUILD = os.path.join(NATIVE_DIR, "build")


def _ensure_built():
    if not (os.path.exists(os.path.join(BUILD, "libemx_dm.so"))
            and os.path.exists(os.path.join(BUILD, "scopectl"))):
        r = subprocess.run(["make", "-C", NATIVE_DIR], capture_output=True)
        if r.returncode != 0:
            pytest.skip(f"native build unavailable: {r.stderr.decode()[-200:]}")


@pytest.fixture(scope="module", autouse=True)
def built():
    _ensure_built()


def test_native_decoder_available():
    from emx.io import dm_native

    assert dm_native.available()


@pytest.mark.parametrize("version", [3, 4])
@pytest.mark.parametrize("data_le", [True, False])
@pytest.mark.parametrize("dtype", ["float32", "uint16", "float64"])
def test_native_matches_python_decoder(tmp_path, version, data_le, dtype):
    from emx.io import dm, dm_native

    rng = np.random.default_rng(7)
    if dtype.startswith("float"):
        img = rng.random((20, 28)).astype(dtype)
    else:
        img = rng.integers(0, 5000, (20, 28)).astype(dtype)
    path = str(tmp_path / f"t.dm{version}")
    dm.write_dm(path, img, version=version, data_le=data_le,
                scale=0.5, units="nm")

    py = dm.read_dm(path, prefer_native=False)
    nat = dm_native.read_dm(path)
    assert nat.version == py.version
    assert nat.data_little_endian == py.data_little_endian
    im_py, im_nat = py.image(), nat.image()
    np.testing.assert_array_equal(np.asarray(im_nat.data, im_py.data.dtype),
                                  im_py.data)
    assert im_nat.scale == pytest.approx(im_py.scale)
    assert im_nat.units == im_py.units
    assert im_nat.is_imaging_mode == im_py.is_imaging_mode


def test_native_decoder_3d_stack(tmp_path):
    from emx.io import dm, dm_native

    stack = np.random.default_rng(0).random((4, 16, 16)).astype(np.float32)
    path = str(tmp_path / "s.dm4")
    dm.write_dm(path, stack, with_thumbnail=False)
    im = dm_native.read_dm(path).image()
    np.testing.assert_array_equal(im.data, stack)


def test_native_decoder_rejects_garbage(tmp_path):
    from emx.io import dm, dm_native

    path = str(tmp_path / "bad.dm3")
    with open(path, "wb") as f:
        f.write(b"\x00\x00\x00\x03" + b"\xff" * 64)
    with pytest.raises(dm.DMDecodeError):
        dm_native.read_dm(path)


def _dm4_with_one_tag(label: bytes, typed_payload: bytes) -> bytes:
    """Minimal hand-crafted DM4: header + root group with one data tag."""
    import struct

    data = struct.pack(">I", 0x25252525) + typed_payload  # magic + typed
    tag = (b"\x15" + struct.pack(">H", len(label)) + label
           + struct.pack(">Q", len(data)) + data)
    group = b"\x01\x01" + struct.pack(">Q", 1) + tag
    return struct.pack(">I", 4) + struct.pack(">Q", len(group)) \
        + struct.pack(">I", 1) + group


def test_native_decoder_crafted_huge_array_count(tmp_path):
    """A file-controlled array count near 2^64 must yield an error JSON,
    not a p+n / es*n overflow that walks off the buffer or an unhandled
    C++ exception crossing the ctypes boundary (ADVICE round 1)."""
    import struct

    from emx.io import dm, dm_native

    # typed: deflen, code=20 (array), elem=6 (f32), n=2^64-8, no payload
    typed = (struct.pack(">Q", 3) + struct.pack(">Q", 20)
             + struct.pack(">Q", 6) + struct.pack(">Q", 2**64 - 8))
    path = str(tmp_path / "huge.dm4")
    with open(path, "wb") as f:
        f.write(_dm4_with_one_tag(b"Data", typed))
    with pytest.raises(dm.DMDecodeError):
        dm_native.read_dm(path)


def test_native_decoder_crafted_huge_image_index(tmp_path):
    """An ImageList entry labelled with a huge numeric index must not
    force a multi-GB images.resize (std::length_error / bad_alloc)."""
    import struct

    from emx.io import dm, dm_native

    # Root group containing ImageList -> group with one entry labelled
    # "99999999999999" -> a tiny string tag (walks record_value paths).
    typed = (struct.pack(">Q", 2) + struct.pack(">Q", 18)
             + struct.pack(">I", 2) + b"hi")
    data = struct.pack(">I", 0x25252525) + typed
    inner_tag = (b"\x15" + struct.pack(">H", 4) + b"Name"
                 + struct.pack(">Q", len(data)) + data)
    inner_group = b"\x01\x01" + struct.pack(">Q", 1) + inner_tag
    entry_label = b"99999999999999"
    entry_tag = (b"\x14" + struct.pack(">H", len(entry_label)) + entry_label
                 + struct.pack(">Q", len(inner_group)) + inner_group)
    entries = b"\x01\x01" + struct.pack(">Q", 1) + entry_tag
    il_tag = (b"\x14" + struct.pack(">H", 9) + b"ImageList"
              + struct.pack(">Q", len(entries)) + entries)
    root = b"\x01\x01" + struct.pack(">Q", 1) + il_tag
    buf = (struct.pack(">I", 4) + struct.pack(">Q", len(root))
           + struct.pack(">I", 1) + root)
    path = str(tmp_path / "hugeidx.dm4")
    with open(path, "wb") as f:
        f.write(buf)
    # Parses fine (the oversized index is simply ignored) — the point is
    # it returns promptly without a giant allocation or a crash.
    out = dm_native.read_dm(path)
    assert out.version == 4


@pytest.fixture(scope="module")
def daemon():
    # port 0 (ephemeral), 64px frames, seed 1, noiseless camera so the
    # focus-metric check is deterministic.
    proc = subprocess.Popen(
        [os.path.join(BUILD, "scopectl"), "0", "64", "1", "0"],
        stdout=subprocess.PIPE,
    )
    line = proc.stdout.readline().decode()
    assert line.startswith("LISTENING ")
    port = int(line.split()[1])
    yield port
    proc.terminate()
    proc.wait(timeout=5)


def test_daemon_protocol_end_to_end(daemon):
    from emx.scope import MicroscopeClient, SocketTransport

    client = MicroscopeClient(SocketTransport(port=daemon))
    client.move_stage_abs(x=5.0, y=6.0, z=1.0)
    assert client.get_stage() == (5.0, 6.0, 1.0)
    client.set_focus(10.0)
    client.change_focus(-4.0)
    assert client.get_focus() == 6.0
    img = client.get_image()
    assert img.shape == (64, 64)
    assert 0.0 <= img.min() and img.max() <= 1.0


def test_daemon_focus_metric(daemon):
    # The C++ camera reproduces the fringe physics: kurtosis-of-Laplacian
    # is lower at the optimum z than defocused.
    from emx.scope import MicroscopeClient, SocketTransport, fresnel_quantifier

    client = MicroscopeClient(SocketTransport(port=daemon))
    client.set_focus(0.0)  # clear state left by earlier protocol tests
    ks = {}
    for z in (-2.0, 0.0, 2.0):
        client.move_stage_abs(z=z)
        ks[z] = fresnel_quantifier(client.get_image())
    assert ks[0.0] < ks[-2.0] and ks[0.0] < ks[2.0]


def test_daemon_concurrent_clients(daemon):
    # Race-safety: many clients hammer the daemon at once; shared camera
    # state is mutex-guarded (the TSAN build target `make -C native tsan`
    # exists for deeper checking).
    import threading

    from emx.scope import MicroscopeClient, SocketTransport

    errors = []

    def worker(i):
        try:
            c = MicroscopeClient(SocketTransport(port=daemon))
            for _ in range(5):
                c.shift_stage(dz=0.1)
                img = c.get_image()
                assert img.shape == (64, 64)
            c.transport.close()
        except Exception as e:
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert not errors, errors


def test_daemon_terminate(daemon):
    from emx.scope import Instruction, SocketTransport

    t = SocketTransport(port=daemon)
    rows = t.execute([Instruction("EMGetStageX")])
    assert rows[0][0] == "8"
    t.close()
