#!/bin/bash
# Round-5 TPU queue, part 2 — picks up after the original queue was replaced
# mid-flight (the rehearsal's post-OOM re-attach outlived the old babysit's
# silence budget; babysit now uses a time-based 1500 s startup grace).
# Strictly serial: waits for the running dense_levers stage, then trace,
# serving A/B, the rehearsal's remaining epoch, the corpus-embedding grid,
# and the reference-width loss arms.
cd /root/repo
export DIR_TPU_COMPILE_CACHE=/root/repo/runs/jaxcache
STS=/root/reference/sts-b-dir/glue_data/STS-B
DENSE_PID="$1"
echo "[queue2] start $(date), waiting on dense_levers pid $DENSE_PID" >> runs/r5_queue.log
while [ -n "$DENSE_PID" ] && kill -0 "$DENSE_PID" 2>/dev/null; do sleep 30; done
echo "[queue2] dense levers done $(date)" >> runs/r5_queue.log

python -m tools.trace_analysis --task nyud2 --batch 64 --out /tmp/dir_trace_b64 \
  > runs/trace_nyud2_b64.txt 2>&1
echo "[queue2] trace done $(date)" >> runs/r5_queue.log

python -m tools.serve_bench --task age --input_dtype uint8 \
  > runs/serve_bench_r5_uint8.jsonl 2>> runs/r5_queue.log
python -m tools.serve_bench --task age --input_dtype float32 \
  > runs/serve_bench_r5_float32.jsonl 2>> runs/r5_queue.log
echo "[queue2] serve bench done $(date)" >> runs/r5_queue.log

# rehearsal: finish epoch 2 + final test (resume from the epoch-2 mid-epoch
# checkpoint; supervised recycling is auto-enabled by the round-5 driver)
python -m tools.babysit \
  --store_dir runs/imdbwiki_full_r5/imdb_wiki_resnet50_lds_gau_5_1.0_fds_gau_5_1.0_0_1_0.9_adam_l1_0.001_128 \
  --stall_seconds 900 --max_restarts 8 -- \
  python -m imbalanced_regression_tpu.tasks.age --dataset imdb_wiki \
  --data_dir runs/imdbwiki_synth --lds --reweight sqrt_inv --fds --epoch 3 \
  --batch_size 128 --loss l1 --store_root runs/imdbwiki_full_r5 \
  --ckpt_every_steps 500 --workers 32 \
  --resume runs/imdbwiki_full_r5/imdb_wiki_resnet50_lds_gau_5_1.0_fds_gau_5_1.0_0_1_0.9_adam_l1_0.001_128 \
  >> runs/imdbwiki_full_r5/queue.log 2>&1
echo "[queue2] rehearsal done $(date)" >> runs/r5_queue.log

python -m tools.babysit --store_dir runs/sts_emb_r5 --stall_seconds 900 -- \
  python -m tools.sts_seeds --data_dir "$STS" --seeds 0 1 2 \
  --arms vanilla lds_fds --glove 1 \
  --word_embs_file runs/sts_emb_r5/corpus_vectors.txt \
  --max_vals 100 --store_root runs/sts_emb_r5 \
  >> runs/sts_emb_r5/queue.log 2>&1
echo "[queue2] embeddings grid done $(date)" >> runs/r5_queue.log

python -m tools.babysit --store_dir runs/sts_ref_r4 --stall_seconds 900 -- \
  python -m tools.sts_seeds --data_dir "$STS" --seeds 0 1 2 \
  --arms huber focal_l1 focal_mse --max_vals 100 --store_root runs/sts_ref_r4 \
  >> runs/sts_ref_r4/babysit_r5.log 2>&1
echo "[queue2] loss arms done $(date)" >> runs/r5_queue.log
echo "[queue2] ALL DONE $(date)" >> runs/r5_queue.log
