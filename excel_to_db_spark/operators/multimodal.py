"""Multimodal column handling: opaque binary payloads + typed metadata.

Design (SURVEY.md §2.C): image/audio/video are `binary` columns with a
metadata struct alongside. The Spark-side plumbing — schema, Arrow batch
shape, `mapInPandas` signatures, partition sizing — is real and tested;
the actual codec call is stubbed (no image/audio libraries exist in this
container) behind `_decode_image_bytes`, which returns a deterministic
fake derived from the bytes so the pipeline stays value-checkable.

Scale notes (100 TB of media):

- Binary payloads ride in parquet pages like any column; column pruning
  means metadata-only queries never touch the bytes.
- `mapInPandas` streams Arrow record batches through Python — decode is
  per-batch vectorized, and `spark.sql.execution.arrow.maxRecordsPerBatch`
  bounds peak memory per task (set it low when payloads are MBs).
- Frame sampling multiplies rows; doing it with `explode` of a computed
  index array (JVM-side) and decoding ONLY sampled frames keeps the
  Python boundary minimal.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = ("doc_id bigint, n_bytes bigint, width int, height int, "
                  "n_channels int")


def with_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary payload column + typed metadata struct
    from the documents table (the testdata has no real media; utf-8 bytes
    of the text stand in — the point is the column shape, not the codec)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(F.length(payload).cast("bigint").alias("n_bytes"),
                 F.lit("fake/rgb8").alias("mime"),
                 F.md5(payload).alias("checksum")))


def _decode_image_bytes(buf: bytes) -> tuple[int, int, int]:
    """STUB codec (no PIL/ffmpeg in this container). Deterministic fake:
    dimensions derived from the byte length. A real deployment drops in
    `PIL.Image.open(io.BytesIO(buf)).size` here — signature unchanged.

    Raises NotImplementedError for payloads a real codec would reject
    (empty), so failure handling is exercised too."""
    if not buf:
        raise NotImplementedError("empty payload: no codec available")
    n = len(buf)
    return (64 + n % 577, 64 + (n * 31) % 389, 3)


def decode_images(df: DataFrame, id_col: str = "doc_id",
                  payload_col: str = "payload") -> DataFrame:
    """Decode payloads via mapInPandas: Arrow batches in, per-batch
    vectorized Python, Arrow batches out. Empty payloads yield NULL dims
    (permissive) rather than failing the task."""
    id_name, pay_name = id_col, payload_col

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = []
            for buf in pdf[pay_name]:
                try:
                    dims.append(_decode_image_bytes(bytes(buf)))
                except NotImplementedError:
                    dims.append((None, None, None))
            w, h, c = zip(*dims) if dims else ((), (), ())
            yield pd.DataFrame({
                "doc_id": pdf[id_name],
                "n_bytes": pdf[pay_name].map(len).astype("int64"),
                "width": pd.array(w, dtype="Int32"),
                "height": pd.array(h, dtype="Int32"),
                "n_channels": pd.array(c, dtype="Int32"),
            })

    return (df.select(F.col(id_col), F.col(payload_col))
            .mapInPandas(decode, schema=DECODED_SCHEMA))


def sample_frame_indices(n_frames: Column, every_k: int) -> Column:
    """Frame-sampling index array [0, k, 2k, ...) — computed JVM-side so
    only sampled frames ever cross into Python."""
    return F.sequence(F.lit(0), n_frames - 1, F.lit(every_k))


def sample_frames(df: DataFrame, every_k: int = 10, id_col: str = "doc_id",
                  payload_col: str = "payload",
                  frame_bytes: int = 16) -> DataFrame:
    """Treat the payload as a fake video of fixed-size frames; emit one
    row per sampled frame with its byte slice. explode() of a JVM-computed
    index array — the decode boundary sees only sampled frames."""
    n_frames = (F.length(F.col(payload_col)) / frame_bytes).cast("int")
    base = (df.filter(F.length(payload_col) >= frame_bytes)
              .select(F.col(id_col), F.col(payload_col),
                      F.explode(sample_frame_indices(n_frames, every_k))
                       .alias("frame_idx")))
    frame = F.substring(F.col(payload_col).cast("string"),
                        F.col("frame_idx") * frame_bytes + 1, frame_bytes)
    return base.select(F.col(id_col),
                       F.col("frame_idx").cast("bigint").alias("frame_idx"),
                       F.md5(frame).alias("frame_checksum"))


FEATURE_SCHEMA = "doc_id bigint, feat array<double>"


def extract_features(df: DataFrame, id_col: str = "doc_id",
                     payload_col: str = "payload") -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas: emits a
    fixed-width feature vector per payload. The featurizer is a
    deterministic byte-statistics stand-in (a real deployment swaps in a
    model forward pass over the decoded image — same signature, same
    Arrow batch shape); kept SQL-expressible so the oracle can verify
    the full pipeline: [n_bytes, n_spaces, n_vowels, mean_byte/255]."""
    pay = payload_col

    def featurize(batches):
        for pdf in batches:
            feats = []
            for buf in pdf[pay]:
                b = bytes(buf)
                n = len(b)
                feats.append([
                    float(n),
                    float(b.count(b" ")),
                    float(sum(b.count(v) for v in (b"a", b"e", b"i", b"o", b"u"))),
                    (sum(b) / n / 255.0) if n else 0.0,
                ])
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "feat": feats})

    return (df.select(F.col(id_col), F.col(payload_col))
            .mapInPandas(featurize, schema=FEATURE_SCHEMA))


def phash64_bits(df: DataFrame, id_col: str = "doc_id",
                 payload_col: str = "payload") -> DataFrame:
    """64-bit perceptual hash of a binary payload as a '0'/'1' bit
    string: the payload is split into 64 balanced chunks (chunk of byte
    position p, 1-based: (p*64 - 1) DIV n) and bit k is 1 iff chunk
    k's mean byte value exceeds the payload mean — the block-mean
    pHash every image-dedup pipeline runs after downscaling, applied
    to the stub-decoded payload (a real deployment feeds the decoded
    8x8 luminance grid through the identical kernel; signature
    unchanged).

    The kernel is a mapInPandas numpy pass (frombuffer + bincount —
    no per-byte Python); the mean test is exact integer cross
    multiplication (sum_k * n > S * len_k), so the DuckDB oracle
    recomputes identical bits from character codes (the corpus is
    ASCII, so byte == code point). Payloads under 64 bytes are
    dropped (a real codec would reject them)."""
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, sigs = [], []
            for did, buf in zip(pdf[id_col], pdf[payload_col]):
                b = np.frombuffer(bytes(buf), dtype=np.uint8)
                n = b.size
                if n < 64:
                    continue
                ks = (np.arange(1, n + 1) * 64 - 1) // n
                sums = np.bincount(ks, weights=b, minlength=64)
                lens = np.bincount(ks, minlength=64)
                sums = sums.astype(np.int64)   # exact: < 2^53 before cast
                total = int(sums.sum())
                bits = sums * n > total * lens
                ids.append(did)
                sigs.append("".join("1" if x else "0" for x in bits))
            yield pd.DataFrame({"did": pd.array(ids, dtype="Int64"),
                                "ph": pd.array(sigs, dtype="string")})

    return (df.select(F.col(id_col), F.col(payload_col))
            .mapInPandas(kernel, "did bigint, ph string"))


def phash_pairs(df: DataFrame, max_hamming: int | None = None,
                id_col: str = "doc_id", payload_col: str = "payload",
                n_blocks: int = 4) -> DataFrame:
    """Near-duplicate payload pairs by pHash: pigeonhole block join on
    16-bit chunks of the bit string (identical machinery to
    simhash_pairs — pairs within hamming < n_blocks are guaranteed
    candidates; the oracle mirrors the same candidate generation), then
    exact hamming via per-chunk XOR bit counts. No cross join: the only
    join key is the (block, chunk-bits) bucket.

    max_hamming defaults to n_blocks - 1, the FULL-RECALL regime of the
    pigeonhole join (ADVICE r4: a larger threshold is best-effort —
    pairs differing in every chunk are missed — so callers must opt
    into it explicitly, as multimodal_phash does with its documented
    recall band)."""
    if max_hamming is None:
        max_hamming = n_blocks - 1
    bits_per = 64 // n_blocks
    ph = phash64_bits(df, id_col, payload_col)
    ints = ph.select(
        "did", "ph",
        *[F.conv(F.substring("ph", c * bits_per + 1, bits_per), 2, 10)
          .cast("int").alias(f"c{c}") for c in range(n_blocks)])
    chunks = ints.select(
        "did", *[f"c{c}" for c in range(n_blocks)],
        F.explode(F.array(*[
            F.struct(F.lit(c).alias("blk"),
                     F.substring("ph", c * bits_per + 1, bits_per)
                     .alias("ck"))
            for c in range(n_blocks)])).alias("bc"))
    # The full bit string stays OUT of the exploded join payload — the
    # hamming only needs the four chunk ints.
    chunks = chunks.select("did", "bc.blk", "bc.ck",
                           *[f"c{c}" for c in range(n_blocks)])
    x, y = chunks.alias("x"), chunks.alias("y")
    ham = sum(F.bit_count(F.col(f"x.c{c}").bitwiseXOR(F.col(f"y.c{c}")))
              for c in range(n_blocks))
    return (x.join(y, (F.col("x.blk") == F.col("y.blk"))
                   & (F.col("x.ck") == F.col("y.ck"))
                   & (F.col("x.did") < F.col("y.did")))
            .select(F.col("x.did").alias("d1"), F.col("y.did").alias("d2"),
                    ham.cast("int").alias("hamming"))
            .distinct()
            .filter(F.col("hamming") <= max_hamming))
