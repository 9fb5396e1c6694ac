"""Property-based round-trip checks for the dependency-free media codecs:
for arbitrary dimensions and channel values, encode→decode must be the
identity. These are local (no Spark) — the distributed stages reuse the
same logic via the by-value closure factory."""

from hypothesis import given, settings, strategies as st

from orion_spark.llm import multimodal as MM

dims = st.tuples(st.integers(1, 6), st.integers(1, 6))


@settings(max_examples=25, deadline=None)
@given(dims, st.integers(0, 255), st.integers(1, 251))
def test_ppm_roundtrip_property(wh, base, step):
    w, h = wh
    vals = [(base + i * step) % 256 for i in range(w * h * 3)]
    assert MM.decode_ppm(MM.encode_ppm(w, h, vals)) == (w, h, vals)


@settings(max_examples=25, deadline=None)
@given(dims, st.integers(0, 255), st.integers(1, 251))
def test_bmp_roundtrip_property(wh, base, step):
    w, h = wh
    vals = [(base + i * step) % 256 for i in range(w * h * 3)]
    assert MM.decode_bmp(MM.encode_bmp(w, h, vals)) == (w, h, vals)


@settings(max_examples=25, deadline=None)
@given(dims, st.integers(0, 255), st.integers(1, 251))
def test_png_roundtrip_property(wh, base, step):
    w, h = wh
    vals = [(base + i * step) % 256 for i in range(w * h * 3)]
    assert MM.decode_png(MM.encode_png(w, h, vals)) == (w, h, vals)


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.integers(-32768, 32767), min_size=1, max_size=40),
    st.sampled_from([1, 2]),
    st.sampled_from([8000, 16000, 44100]),
)
def test_wav_roundtrip_property(samples, nch, rate):
    # sample count must be a channel multiple for a well-formed file
    samples = samples[: len(samples) - len(samples) % nch] or [0] * nch
    payload = MM.encode_wav(samples, n_channels=nch, sample_rate=rate)
    assert MM.decode_wav(payload) == (nch, rate, samples)


@settings(max_examples=25, deadline=None)
@given(
    st.integers(0, 10**6),
    st.sampled_from([600, 1000, 90000]),
    st.lists(st.tuples(st.integers(0, 4096), st.integers(0, 4096)),
             min_size=0, max_size=3),
)
def test_mp4_metadata_property(duration, timescale, tracks):
    meta = MM.mp4_metadata(MM.encode_mp4_stub(duration, timescale, tracks))
    assert meta["duration"] == duration
    assert meta["timescale"] == timescale
    assert meta["n_tracks"] == len(tracks)
    assert meta["duration_ms"] == duration * 1000 // timescale
    sized = [t for t in tracks if t[0] > 0]
    if sized:
        assert (meta["width"], meta["height"]) == sized[0]
