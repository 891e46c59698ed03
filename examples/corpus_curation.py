"""End-to-end training-corpus curation example — the LLM-data-pipeline
surface chained the way a production run would chain it.

Run:  python examples/corpus_curation.py [sf_dir]

Stages (each one scan/shuffle-shaped for 100 TB, see PLANS.md):

0. ingest + triage: WARC crawl round-trip (gzip member-per-record,
   file = task) → HTML → text extraction; probe-first image/video
   filters (header bytes, no decode); SRT/WebVTT caption transcripts;
1. quality gate: token/stopword/quality-score columns, pure projection;
2. LM-surprise gate: corpus-unigram mean log-probability, drop the
   bottom tail (the CCNet-style model-based quality screen);
3. content-policy gate: blocklist-density screen, pure projection;
4. exact dedup: keep one doc per normalized text (hash groupBy);
5. near-dup removal: MinHash+LSH pairs → connected components → keep
   cluster representatives;
6. substring-span screen: drop docs that are mostly cross-corpus
   verbatim boilerplate (Lee et al. span coverage > 0.5);
7. benchmark decontamination: n-gram overlap against a held-out slice;
8. semantic dedup: SemDeDup over the docs' embeddings (BLAS cell path);
9. domain mixing: deterministic-hash downsample to an equal source mix;
10. training layout: deterministic shard + fixed-budget context packing,
    then a per-epoch shuffle key;
11. training export: hashed token ids to Megatron-style uint16 .bin
    shards with a CRC manifest;
12. RAG index prep: overlapping token-window chunks of the same curated
    corpus.

Returns the funnel counts per stage plus the packed-context stats.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from entropy_balance_weighting_spark.functions import (
    dedup,
    packing,
    sampling,
    similarity,
    text,
)
from entropy_balance_weighting_spark.session import get_spark, load_table
from entropy_balance_weighting_spark.sources import write_token_shards


def main(sf_dir: str = "/root/testdata/sf0.001", spark=None) -> dict:
    """Run the curation funnel; pass an existing SparkSession to reuse it
    (the CI test does), else one is created and stopped here."""
    owns_session = spark is None
    if owns_session:
        spark = get_spark(app_name="corpus_curation_example")

    docs = load_table(spark, sf_dir, "documents")
    n_raw = docs.count()

    # 0. media triage — PROBE FIRST, decode survivors only (the 100 TB
    #    pattern: a dimension/aspect filter that full-decodes every blob
    #    pays orders of magnitude more CPU than one that reads headers;
    #    see bench_media.py's probe_vs_decode row for the measured ratio).
    #    The blobs here are synthetic stand-ins for an image-bearing
    #    corpus column; probe and decode both run as Arrow mapInPandas
    #    stages, map-only, no shuffle.
    import numpy as np

    from entropy_balance_weighting_spark.functions import multimodal as mm

    def _img_blob(i: int) -> bytes:
        side = 16 if i % 3 == 0 else 64  # every 3rd image is a thumbnail
        g = ((np.arange(side)[:, None] * 3 + np.arange(side)[None, :] * 5 + i)
             % 256).astype(np.uint8)
        return mm.encode_bmp(np.stack([g, g, g], axis=-1))

    imgs = spark.createDataFrame(
        [(i, bytearray(_img_blob(i))) for i in range(24)],
        "img_id long, payload binary",
    )

    def probe_stage(it):
        import pandas as pd

        for pdf in it:
            out = mm.probe_image_batch(pdf["payload"])
            out.insert(0, "img_id", pdf["img_id"].to_numpy())
            yield out[["img_id", "format", "width", "height"]]

    probed = imgs.mapInPandas(
        probe_stage, "img_id long, format string, width int, height int"
    )
    keep_ids = probed.filter(
        (F.col("width") >= 32) & (F.col("height") >= 32)
    ).select("img_id")
    survivors = imgs.join(keep_ids, "img_id")

    def decode_stage(it):
        for pdf in it:
            out = mm.decode_image_batch(pdf["payload"])
            out.insert(0, "img_id", pdf["img_id"].to_numpy())
            yield out[["img_id", "width", "height", "feature"]]

    decoded = survivors.mapInPandas(
        decode_stage,
        "img_id long, width int, height int, feature array<double>",
    )
    n_img_raw = imgs.count()
    n_img_kept = decoded.count()  # only survivors ever hit the decoder

    # 0b. VIDEO triage — the same probe-first pattern for the codec a
    #     100 TB video corpus is actually full of: each MP4 carries an
    #     avcC record whose SPS gives true (crop-corrected) dimensions,
    #     profile, level and fps from HEADER BYTES ALONE
    #     (functions/container_meta.py parse_h264_sps; HEVC/AV1 probes
    #     are the same shape).  Filter on resolution without a single
    #     frame decode.
    from entropy_balance_weighting_spark.functions import container_meta as cmx

    def _vid_blob(i: int) -> bytes:
        w, h = (1920, 1080) if i % 2 else (320, 240)
        sps = cmx.build_h264_sps(
            width=w, height=h, profile_idc=100, level_idc=41, fps=30.0
        )
        trak = cmx.build_mp4_track(
            handler="vide", fixed_sample_size=512,
            stsd_entry=cmx.build_avc1_entry(cmx.build_avcc(sps), width=w, height=h),
        )
        return cmx.build_mp4(b"fake-mdat", extra_moov_children=trak)

    vids = spark.createDataFrame(
        [(i, bytearray(_vid_blob(i))) for i in range(8)],
        "vid_id long, payload binary",
    )

    def video_probe_stage(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for vid, blob in zip(pdf["vid_id"], pdf["payload"]):
                (tr,) = cmx.probe_mp4_tracks(bytes(blob))
                h264 = tr.get("h264", {})
                rows.append(
                    (int(vid), tr["codec"], h264.get("width", 0),
                     h264.get("height", 0), h264.get("fps", 0.0))
                )
            yield pd.DataFrame(
                rows, columns=["vid_id", "codec", "width", "height", "fps"]
            )

    vprobed = vids.mapInPandas(
        video_probe_stage,
        "vid_id long, codec string, width int, height int, fps double",
    )
    n_vid_hd = vprobed.filter(F.col("height") >= 720).count()

    # 0c. crawl ingest — the corpus as it actually ARRIVES: WARC files
    #     (ISO 28500, the Common Crawl shape).  Round-trip the documents
    #     through a gzip member-per-record WARC export, re-read with the
    #     binaryFile → mapInPandas source (file = task), and recover the
    #     visible text with the pure-JVM HTML strip chain.  At 100 TB
    #     this stage is the ENTIRE ingest: everything downstream is the
    #     same funnel.
    import os
    import shutil as _sh

    from entropy_balance_weighting_spark.functions import web
    from entropy_balance_weighting_spark.sources import read_warc, write_warc

    warc_dir = os.path.join(
        str(Path(__file__).resolve().parents[1]), ".scratch", "example_warc"
    )
    _sh.rmtree(warc_dir, ignore_errors=True)
    crawl = docs.select(
        "doc_id",
        F.concat(
            F.lit("http://"), F.col("source"), F.lit(".example.com/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.concat(
            F.lit("<html><body><p>"), F.col("text"), F.lit("</p></body></html>")
        ).alias("body"),
    )
    write_warc(crawl, warc_dir, n_files=4, id_col="doc_id")
    fetched = read_warc(spark, warc_dir, glob="*.warc.gz")
    n_warc_records = fetched.filter(F.col("warc_type") == "response").count()

    extracted = fetched.filter(F.col("warc_type") == "response").select(
        F.regexp_extract("target_uri", r"/(\d+)$", 1).cast("long")
        .alias("doc_id"),
        web.strip_html(F.col("payload").cast("string")).alias("text"),
    )
    n_extracted = extracted.filter(F.length("text") > 0).count()

    # 0d. caption sidecar — the text a VIDEO corpus contributes without
    #     decoding a frame: parse SRT/WebVTT subtitle payloads into cue
    #     arrays (JVM array expressions) and surface transcripts +
    #     on-screen-span quality signals for the text funnel.
    from entropy_balance_weighting_spark.functions import subtitles as subf

    caps = docs.limit(40).select(
        "doc_id",
        F.concat(
            F.lit("1\n00:00:01,000 --> 00:00:03,000\n"),
            F.substring("text", 1, 30),
            F.lit("\n\n2\n00:00:03,500 --> 00:00:06,000\n"),
            F.substring("text", 31, 30),
        ).alias("srt"),
    )
    transcripts = caps.select(
        "doc_id",
        subf.subtitle_text(subf.srt_cues("srt")).alias("transcript"),
        subf.subtitle_span_ms(subf.srt_cues("srt")).alias("span_ms"),
    )
    n_caption_docs = transcripts.filter(
        (F.col("span_ms") >= 4000) & (F.length("transcript") > 0)
    ).count()

    # 1. quality gate — all pure column expressions, zero shuffle
    scored = text.annotate_token_stats(docs)
    kept_q = scored.filter((F.col("n_tok") >= 10) & (F.col("q") > 0.3))
    n_quality = kept_q.count()

    # 2. LM-surprise gate — drop the least-corpus-typical 5% of docs
    lp = text.unigram_doc_logprob(docs).select("doc_id", "logprob")
    p05 = lp.agg(F.percentile("logprob", 0.05)).first()[0]
    kept_lm = kept_q.join(lp, "doc_id").filter(F.col("logprob") >= p05)
    n_lm = kept_lm.count()

    # 3. content-policy gate — blocklist density < 20%
    hits = text.blocklist_hits("text", ("slow", "error"))
    kept_p = kept_lm.filter(hits / F.col("n_tok") < 0.2)
    n_policy = kept_p.count()

    # 3. exact dedup — first doc_id per normalized text
    canon = (
        kept_p.groupBy(F.lower(F.trim(F.col("text"))).alias("norm"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    deduped = kept_p.join(canon, "doc_id")
    n_exact = deduped.count()

    # 4. near-dup removal — LSH pairs, star components, keep min-id reps
    pairs = dedup.verified_near_dups(deduped, "doc_id", "text", threshold=0.8)
    cc = dedup.connected_components(pairs)
    drop = cc.filter(F.col("id") != F.col("cluster_id")).select(
        F.col("id").alias("doc_id")
    )
    near_deduped = deduped.join(drop, "doc_id", "left_anti")
    n_near = near_deduped.count()

    # 6. substring-span screen — docs that are >50% covered by verbatim
    #    cross-corpus 6-gram spans are boilerplate shells, not content
    spans = dedup.duplicated_span_profile(
        near_deduped, id_col="doc_id", text_col="text", k=6, min_df=2
    )
    shells = spans.filter(F.col("coverage") > 0.5).select(
        F.col("id").alias("doc_id")
    )
    span_clean = near_deduped.join(shells, "doc_id", "left_anti")
    n_spans = span_clean.count()

    # 6b. span SURGERY on the survivors — excise remaining duplicated
    #     spans (keeping one canonical copy per span) instead of dropping
    #     whole documents; only documents that actually lose a span pay
    #     the token-level rebuild
    excised = dedup.remove_duplicated_spans(
        span_clean, id_col="doc_id", text_col="text", k=6, min_df=2
    )
    n_excised_tokens = int(
        excised.agg(F.sum("n_removed_tokens")).first()[0] or 0
    )
    span_clean = span_clean.drop("text").join(
        excised.select(
            F.col("id").alias("doc_id"), F.col("clean_text").alias("text")
        ),
        "doc_id",
    )

    # 5. decontamination — drop training docs sharing any 3-gram with the
    #    held-out benchmark slice (doc_id < 20 stands in for the bench set)
    bench = docs.filter(F.col("doc_id") < 20)
    contaminated = dedup.decontaminate(
        span_clean, bench, id_col="doc_id", text_col="text"
    ).select(F.col("id").alias("doc_id"))
    clean = span_clean.join(contaminated, "doc_id", "left_anti")
    n_clean = clean.count()

    # 8. semantic dedup — SemDeDup over the docs' embeddings (vec_id is
    #    the doc key); BLAS cell path with explicit centroids
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    centers = similarity.fit_ivf_quantizer(emb, n_cells=8)
    sem = similarity.semantic_dedup_assignments(
        emb, threshold=0.45, centers=np.asarray(centers), method="blas"
    )
    sem_drop = sem.filter(F.col("removed") == 1).select(
        F.col("id").alias("doc_id")
    )
    clean = clean.join(sem_drop, "doc_id", "left_anti")
    n_semantic = clean.count()

    # 8b. binary-embedding neighbor screen — sign-bit quantization +
    #     XOR-popcount Hamming (the 32x-smaller scan next to the PQ
    #     path): count probe neighbors inside a Hamming radius as the
    #     cheap near-dup telemetry a 100 TB embedding store runs first
    ham = similarity.hamming_topk(emb, probe_ids=[0, 1, 2], k=10)
    n_ham_close = ham.filter(F.col("hamming") <= 24).count()

    # 7. domain mixing — equal source shares via the deterministic
    #    hash sampler (membership re-derivable from (doc_id, salt))
    sources = [r.source for r in clean.select("source").distinct().collect()]
    mixed = sampling.resample_to_mix(
        clean, "doc_id", "source", {s: 1.0 / len(sources) for s in sources},
        salt="mix0",
    )
    n_mixed = mixed.count()

    # 8. training layout — shard + pack + epoch shuffle key
    packed = packing.pack_sequences(mixed, budget=512, n_shards=8, salt="ep0")
    ctx = packed.groupBy("shard", "context_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("context_tokens"),
    )
    n_contexts = ctx.count()
    fill = ctx.agg(F.avg("context_tokens")).first()[0]

    # 11. training export — REAL BPE subword tokens (fit distributed,
    #     merge loop driver-side on the capped word-frequency table,
    #     apply as one Arrow map stage), hashed into a uint16 id space
    #     for the shard writer; the CRC manifest is the export's
    #     acceptance record
    import tempfile

    from entropy_balance_weighting_spark.functions import bpe

    # byte-level alphabet (GPT-2 lineage): the vocab is CLOSED (256 byte
    # stand-ins + one id per merge), so ids are true vocab indices, not
    # hashes — what a real trainer consumes
    merges = bpe.fit_bpe(mixed, n_merges=200, alphabet="byte")
    vocab = bpe.bpe_vocab(merges)
    id_of = F.map_from_arrays(
        F.array(*[F.lit(t) for t in vocab]),
        F.array(*[F.lit(i) for i in range(len(vocab))]),
    )
    tok_ids = bpe.bpe_encode(mixed, merges, alphabet="byte").select(
        "doc_id",
        F.transform(
            F.col("tokens"),
            # +1 shifts past the shard writer's eos_id=0; vocab ids are
            # dense so uint16 holds 256+200+1 comfortably
            lambda t: (F.element_at(id_of, t) + 1).cast("int"),
        ).alias("tokens"),
    )
    shard_dir = tempfile.mkdtemp(prefix="token_shards_")
    manifest = write_token_shards(
        tok_ids, shard_dir, n_shards=4, dtype="uint16", eos_id=0
    )
    exported = manifest.agg(
        F.sum("n_docs").alias("docs"), F.sum("n_tokens").alias("toks")
    ).first()
    n_exported_docs, n_exported_tokens = int(exported[0]), int(exported[1])

    # 11b. the OTHER tokenizer family on the same curated text — a
    #      unigram LM (SentencePiece lineage); trainers disagree on
    #      tokenizers, a curation pipeline should speak both
    from entropy_balance_weighting_spark.functions import unigram as ug

    upieces = ug.unigram_encode(
        mixed, ug.fit_unigram(mixed, vocab_size=400, n_em_iters=2)
    )
    avg_unigram_pieces = float(
        upieces.agg(F.avg("n_pieces")).first()[0] or 0.0
    )

    # 9. RAG index prep — overlapping token-window chunks of the curated
    #    corpus (the retrieval-side consumer of the same curation output)
    chunks = text.chunk_documents(mixed, chunk_tokens=64, overlap_tokens=16)
    n_chunks = chunks.count()

    out = {
        "n_raw": n_raw,
        "n_images_probed": n_img_raw,
        "n_images_decoded": n_img_kept,
        "n_videos_hd": n_vid_hd,
        "n_warc_records": n_warc_records,
        "n_html_extracted": n_extracted,
        "n_caption_docs": n_caption_docs,
        "n_quality": n_quality,
        "n_lm_gate": n_lm,
        "n_policy": n_policy,
        "n_exact_dedup": n_exact,
        "n_near_dedup": n_near,
        "n_span_screened": n_spans,
        "n_excised_span_tokens": n_excised_tokens,
        "n_decontaminated": n_clean,
        "n_semantic_dedup": n_semantic,
        "n_domain_mixed": n_mixed,
        "n_contexts": n_contexts,
        "avg_context_tokens": float(fill),
        "n_exported_docs": n_exported_docs,
        "n_exported_tokens": n_exported_tokens,
        "avg_unigram_pieces": avg_unigram_pieces,
        "n_hamming_close_pairs": n_ham_close,
        "n_rag_chunks": n_chunks,
    }
    print(out)
    if owns_session:
        spark.stop()
    return out


if __name__ == "__main__":
    main(*sys.argv[1:2])
