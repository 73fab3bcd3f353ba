#!/bin/bash
# Round-5 TPU experiment queue — strictly serial (ONE process may hold the
# TPU; see CLAUDE.md). Each stage appends to its own log; sweeps are
# idempotent so a rerun of this script skips finished work.
cd /root/repo
export DIR_TPU_COMPILE_CACHE=/root/repo/runs/jaxcache
STS=/root/reference/sts-b-dir/glue_data/STS-B
echo "[queue] start $(date)" >> runs/r5_queue.log

# 0. wait for STS phase 1 (vanilla/lds/rrt @ width, max_vals 100)
while kill -0 $(cat /tmp/sts_phase1.pid 2>/dev/null) 2>/dev/null; do sleep 60; done
echo "[queue] phase1 done $(date)" >> runs/r5_queue.log

# 1. IMDB-WIKI 191k full-scale rehearsal: 3 epochs LDS+FDS, bounded-memory
#    input (auto -> mmap), mid-epoch checkpoints, babysat
mkdir -p runs/imdbwiki_full_r5
python -m tools.babysit \
  --store_dir runs/imdbwiki_full_r5/imdb_wiki_resnet50_lds_gau_5_1.0_fds_gau_5_1.0_0_1_0.9_adam_l1_0.001_128 \
  --stall_seconds 900 -- \
  python -m imbalanced_regression_tpu.tasks.age --dataset imdb_wiki \
  --data_dir runs/imdbwiki_synth --lds --reweight sqrt_inv --fds --epoch 3 \
  --batch_size 128 --loss l1 --store_root runs/imdbwiki_full_r5 \
  --ckpt_every_steps 500 --workers 32 \
  >> runs/imdbwiki_full_r5/queue.log 2>&1
echo "[queue] rehearsal done $(date)" >> runs/r5_queue.log

# 2. dense-path batch-scaling A/B (weight-grad lever follow-up)
python -m tools.dense_levers --variants baseline batch64 batch128 batch64_hw256x320 \
  --json runs/dense_levers_r5.jsonl >> runs/dense_levers_r5.log 2>&1
echo "[queue] dense levers done $(date)" >> runs/r5_queue.log

# 3. dense trace at batch 64: weight-grad conv attribution
python -m tools.trace_analysis --task nyud2 --batch 64 --out /tmp/dir_trace_b64 \
  > runs/trace_nyud2_b64.txt 2>&1
echo "[queue] trace done $(date)" >> runs/r5_queue.log

# 4. serving A/B: uint8 vs float32 input signature (age), nyud2 row
python -m tools.serve_bench --task age --input_dtype uint8 \
  > runs/serve_bench_r5_uint8.jsonl 2>> runs/r5_queue.log
python -m tools.serve_bench --task age --input_dtype float32 \
  > runs/serve_bench_r5_float32.jsonl 2>> runs/r5_queue.log
echo "[queue] serve bench done $(date)" >> runs/r5_queue.log

# 5. corpus-embedding STS runs (zero-egress GloVe stand-in): vanilla vs
#    LDS+FDS at reference width, 3 seeds, frozen corpus-internal table
python -m tools.babysit --store_dir runs/sts_emb_r5 --stall_seconds 900 -- \
  python -m tools.sts_seeds --data_dir "$STS" --seeds 0 1 2 \
  --arms vanilla lds_fds --glove 1 \
  --word_embs_file runs/sts_emb_r5/corpus_vectors.txt \
  --max_vals 100 --store_root runs/sts_emb_r5 \
  >> runs/sts_emb_r5/queue.log 2>&1
echo "[queue] embeddings grid done $(date)" >> runs/r5_queue.log

# 6. loss arms at reference width (huber beta=0.3, focal_l1, focal_mse)
python -m tools.babysit --store_dir runs/sts_ref_r4 --stall_seconds 900 -- \
  python -m tools.sts_seeds --data_dir "$STS" --seeds 0 1 2 \
  --arms huber focal_l1 focal_mse --max_vals 100 --store_root runs/sts_ref_r4 \
  >> runs/sts_ref_r4/babysit_r5.log 2>&1
echo "[queue] loss arms done $(date)" >> runs/r5_queue.log
echo "[queue] ALL DONE $(date)" >> runs/r5_queue.log
