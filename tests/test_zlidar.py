"""zLidar codec: encode/decode round trips + LAS interop."""
import numpy as np
import pandas as pd


def _cloud(n=130_007, seed=5):
    # deterministic, exercises every stream: multi-return contexts,
    # u8/u16 intensity split, classification runs, gps deltas, >1 block
    i = np.arange(n, dtype=np.int64)
    h = (i * 2654435761 + seed) % 2147483647
    nr = (h % 5 + 1).astype(np.int64)
    rn = (h // 7) % nr + 1
    return pd.DataFrame({
        "x": np.round(((h % 100000) * 0.013) % 5000.0, 3),
        "y": np.round(((h % 77777) * 0.017) % 5000.0, 3),
        "z": np.round((h % 9000) * 0.01, 3),
        "intensity": (h % 900).astype(np.int64),          # crosses 255
        "return_number": rn, "number_of_returns": nr,
        "classification": ((h // 13) % 4).astype(np.int64),
        "gps_time": np.round((i // 3) * 0.5, 6),           # runs of equals
    })


def test_zlidar_roundtrip_exact():
    from whitebox_tools_spark.zlidar_io import decode_zlidar, encode_zlidar

    pdf = _cloud()
    out = decode_zlidar(encode_zlidar(pdf, scale=0.001))
    # 3-decimal coords survive the 0.001 quantization to 6 dp
    for c in ("x", "y", "z"):
        assert np.allclose(out[c], pdf[c], atol=5e-7), c
    for c in ("intensity", "return_number", "number_of_returns", "classification"):
        assert (out[c].to_numpy() == pdf[c].to_numpy()).all(), c
    assert np.allclose(out["gps_time"], pdf["gps_time"], atol=0)


def test_las_zlidar_las_chain(tmp_path):
    from whitebox_tools_spark.lidar_io import decode_las, encode_las
    from whitebox_tools_spark.zlidar_io import las_to_zlidar, zlidar_to_las

    pdf = _cloud(n=3001)
    las1 = tmp_path / "a.las"
    zl = tmp_path / "a.zlidar"
    las2 = tmp_path / "b.las"
    las1.write_bytes(encode_las(pdf))
    las_to_zlidar(str(las1), str(zl))
    zlidar_to_las(str(zl), str(las2))
    a = decode_las(las1.read_bytes())
    b = decode_las(las2.read_bytes())
    for c in ("x", "y", "z"):
        assert np.allclose(a[c], b[c], atol=5e-7), c
    for c in ("intensity", "classification"):
        assert (a[c].to_numpy() == b[c].to_numpy()).all(), c
    # LAS format 0 clips returns at 7; the chain must preserve the clip
    for c in ("return_number", "number_of_returns"):
        assert (a[c].to_numpy() == b[c].to_numpy()).all(), c
