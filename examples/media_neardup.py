"""Runnable example: perceptual near-duplicate detection across all
three media kinds — image, audio, video — on one shared banding machine.

Synthesizes REAL decodable payloads (24-bit BMPs, mono 16-bit PCM WAVs,
frames-tables of BMP video frames) keyed to the documents table, hashes
each with the integer perceptual fingerprints (aHash/dHash for images,
energy-envelope/temporal-gradient for audio, per-frame-hash +
bitwise-majority vote for video clips), and pairs near-duplicates via
the 16-bit-chunk Hamming banding shared with the SimHash text path.

    python examples/media_neardup.py [sf_dir]  # default /root/testdata/sf0.01
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from otit_swt_spark.pipelines.dedup import hamming_banded_pairs  # noqa: E402
from otit_swt_spark.pipelines.multimodal import (  # noqa: E402
    audio_hashes,
    clip_majority_hash,
    image_hashes,
    synth_gray_bmp,
    synth_pcm_wav,
    synth_video_frames,
)
from otit_swt_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("example_media", cpus=8)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id")

    # --- images: decode -> integer aHash -> banded pairing ------------
    imgs = image_hashes(synth_gray_bmp(docs)).persist()
    img_pairs = hamming_banded_pairs(imgs, id_col="media_id",
                                     fp_col="ahash", max_distance=3)
    print(f"image near-dup pairs: {img_pairs.count()}")
    img_pairs.orderBy("id_a", "id_b").show(5)

    # --- audio: WAV decode -> envelope hash -> the SAME pairing -------
    auds = audio_hashes(synth_pcm_wav(docs)).persist()
    aud_pairs = hamming_banded_pairs(auds, id_col="media_id",
                                     fp_col="ahash", max_distance=3)
    print(f"audio near-dup pairs: {aud_pairs.count()}")

    # --- video: frames table -> per-frame hash -> majority clip hash --
    frames = synth_video_frames(docs)
    clip = clip_majority_hash(
        image_hashes(frames, id_col="media_id"), "ahash",
        "media_id").persist()
    vid_pairs = hamming_banded_pairs(clip, id_col="media_id",
                                     fp_col="clip_hash", max_distance=3)
    print(f"video near-dup pairs: {vid_pairs.count()}")

    # clips whose image twin ALSO flagged them — cross-modal agreement
    both = (vid_pairs.select("id_a", "id_b")
            .intersect(img_pairs.select("id_a", "id_b")))
    print(f"pairs flagged by both image and video paths: {both.count()}")
    spark.stop()


if __name__ == "__main__":
    main()
