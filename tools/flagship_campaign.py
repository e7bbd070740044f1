"""Round-5 flagship off-ceiling quality campaign.

Drives the ``tools/train_compare.py`` flagship protocol (hard task, cgcn
stack, adam, trigger_copies=2, n_train=2400 — see docs/design.md §8
item 6) at campaign scale with a **convergence-matched stop**: both
frameworks run under the SAME early-stop rule — training is terminated
once the shared TSV log (``logs.txt``, identical format in both
frameworks) shows no best-dev improvement for ``--patience`` epochs
(after ``--min_epochs``), with a hard cap of ``--num_epoch``.  The
selection metric (test F1 at best dev, reference ``train.py:287-293``)
is recovered from the "new best model saved at epoch E: P R F1" lines
both frameworks write to logs.txt at every new best, so a terminated
run loses nothing.

Scheduling: reference jobs (torch, CPU-only — it has no TPU support)
run ``--ref_parallel`` at a time under ``nice``; gcn_tpu jobs run on
the real chip, strictly one at a time (single tunneled device).  Both
queues run concurrently; per-seed staged data is byte-identical for
both frameworks (``make_sample_data --seed <train seed>`` — round 5
gives every seed FRESH task data, unlike the round-4 table where all
seeds shared the generator default 1234).

Results stream to ``<out>/results.jsonl`` (one JSON line per completed
run) so a partial campaign is already analyzable.

    python tools/flagship_campaign.py --out /tmp/campaign_r5 \
        --seeds 11,17,29,37,53,61,71,83,91,101,111
    # ours-only attention arm reusing the same staged data:
    python tools/flagship_campaign.py --out /tmp/campaign_r5 \
        --seeds 11,17,29 --ours_only --adj_type attention --tag attention
"""

from __future__ import annotations

import argparse
import json
import os
import queue
import re
import signal
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"


def stage_data(workdir, seed, n_train, trigger_copies):
    """Generate the hard-task corpus + vocab into workdir (idempotent)."""
    done = os.path.join(workdir, ".staged")
    if os.path.exists(done):
        return os.path.join(workdir, "data")
    os.makedirs(workdir, exist_ok=True)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_sample_data.py"),
         "--out", workdir, "--n", str(n_train), "--task", "hard",
         "--trigger_copies", str(trigger_copies), "--seed", str(seed)],
        capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    data = os.path.join(workdir, "data")
    os.rename(os.path.join(workdir, "tacred"), data)
    import shutil
    shutil.copy(os.path.join(data, "train.json"),
                os.path.join(data, "train_0.1.json"))
    open(done, "w").close()
    return data


def flags(args, workdir, seed, adj_type):
    f = [
        "--vocab_dir", os.path.join(workdir, "vocab"),
        "--num_epoch", str(args.num_epoch),
        "--batch_size", str(args.batch_size),
        "--optim", args.optim, "--lr", str(args.lr),
        "--decay_epoch", str(args.num_epoch + 1),
        "--prune_k", "1", "--num_layers", "2",
        "--seed", str(seed),
        "--hidden_dim", "64", "--rnn_hidden", "32",
        "--adj_type", adj_type,
        "--deprel_emb_dim", "16",
        "--word_dropout", "0.04",
    ]
    return f


def read_log(path):
    rows, best_lines = [], []
    try:
        with open(path) as fh:
            for line in fh:
                if line.startswith("#"):
                    continue
                m = re.match(r"new best model saved at epoch (\d+):\s*"
                             r"([\d.]+)\s+([\d.]+)\s+([\d.]+)", line)
                if m:
                    best_lines.append((int(m.group(1)),
                                       float(m.group(4)) / 100.0))
                    continue
                parts = line.split("\t")
                if len(parts) >= 5:
                    try:
                        rows.append((int(parts[0]), float(parts[3])))
                    except ValueError:
                        pass
    except FileNotFoundError:
        pass
    return rows, best_lines


def run_one(args, seed, framework, adj_type, results_lock, results_path):
    """Launch one training run with the shared early-stop watcher."""
    workdir = os.path.join(args.out, f"seed{seed}")
    data = stage_data(workdir, seed, args.n_train, args.trigger_copies)
    tag = args.tag or adj_type
    save = os.path.join(workdir, f"{framework}_{tag}_models")
    log_path = os.path.join(save, "cmp", "logs.txt")
    if framework == "reference":
        cmd = ["nice", "-n", "10", sys.executable,
               os.path.join(REF, "train.py"),
               "--data_dir", data, "--model_save_dir", save,
               "--test_save_dir", os.path.join(workdir, f"ref_{tag}_test"),
               "--id", "cmp", "--cpu",
               *flags(args, workdir, seed, adj_type)]
        env = {**os.environ, "CUDA_VISIBLE_DEVICES": "",
               "OMP_NUM_THREADS": "1"}
        cwd = REF
    else:
        cmd = [sys.executable, os.path.join(REPO, "train.py"),
               "--data_dir", data, "--model_save_dir", save,
               "--id", "cmp",
               # eval F1 is batching-invariant; big eval batches cut the
               # per-epoch eval dispatch count over the relay ~10x
               "--eval_batch_size", str(args.ours_eval_batch_size),
               *flags(args, workdir, seed, adj_type)]
        env = dict(os.environ)
        env.setdefault("JAX_COMPILATION_CACHE_DIR",
                       os.path.join(REPO, ".jax_tpu_cache"))
        env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
        cwd = REPO
    t0 = time.time()
    stdout_path = os.path.join(workdir, f"{framework}_{tag}.out")
    with open(stdout_path, "w") as out_fh:
        p = subprocess.Popen(cmd, cwd=cwd, env=env, stdout=out_fh,
                             stderr=subprocess.STDOUT,
                             start_new_session=True)
        stopped_early = False
        while True:
            try:
                p.wait(timeout=15)
                break
            except subprocess.TimeoutExpired:
                pass
            if time.time() - t0 > args.max_wall_s:
                os.killpg(p.pid, signal.SIGTERM)
                stopped_early = True
                try:
                    p.wait(timeout=60)
                except subprocess.TimeoutExpired:
                    os.killpg(p.pid, signal.SIGKILL)
                    p.wait()  # reap; records the real returncode
                break
            rows, _ = read_log(log_path)
            if len(rows) >= args.min_epochs:
                best_ep = max(rows, key=lambda r: (r[1], -r[0]))[0]
                if rows[-1][0] - best_ep >= args.patience:
                    os.killpg(p.pid, signal.SIGTERM)
                    stopped_early = True
                    try:
                        p.wait(timeout=60)
                    except subprocess.TimeoutExpired:
                        os.killpg(p.pid, signal.SIGKILL)
                        p.wait()  # reap; records the real returncode
                    break
    wall = time.time() - t0
    rows, best_lines = read_log(log_path)
    rec = {
        "seed": seed, "framework": framework, "adj_type": adj_type,
        "tag": tag,
        "epochs_run": len(rows),
        "best_dev_f1": max((f1 for _, f1 in rows), default=None),
        "best_epoch": (max(rows, key=lambda r: (r[1], -r[0]))[0]
                       if rows else None),
        "test_f1_at_best_dev": (best_lines[-1][1] if best_lines else None),
        "stopped_early": stopped_early,
        "returncode": p.returncode,
        "wall_s": round(wall, 1),
        "dev_f1_trajectory": [round(f1, 4) for _, f1 in rows],
    }
    with results_lock:
        with open(results_path, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
    print(json.dumps({k: rec[k] for k in
                      ("seed", "framework", "tag", "epochs_run",
                       "best_dev_f1", "test_f1_at_best_dev", "wall_s")}),
          flush=True)
    return rec


def worker(q, args, results_lock, results_path):
    while True:
        try:
            seed, framework, adj = q.get_nowait()
        except queue.Empty:
            return
        try:
            run_one(args, seed, framework, adj, results_lock, results_path)
        except Exception as e:  # keep the queue draining
            print(f"FAILED seed={seed} {framework}: {e}", file=sys.stderr,
                  flush=True)
        finally:
            q.task_done()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--seeds", required=True)
    p.add_argument("--num_epoch", type=int, default=100)
    p.add_argument("--patience", type=int, default=15,
                   help="early-stop: no best-dev improvement for this "
                        "many epochs (identical rule for both frameworks)")
    p.add_argument("--min_epochs", type=int, default=30)
    p.add_argument("--max_wall_s", type=int, default=9000)
    p.add_argument("--batch_size", type=int, default=10)
    p.add_argument("--optim", default="adam")
    p.add_argument("--lr", type=float, default=0.2)
    p.add_argument("--n_train", type=int, default=2400)
    p.add_argument("--trigger_copies", type=int, default=2)
    p.add_argument("--adj_type", default="full_deprel")
    p.add_argument("--tag", default=None,
                   help="label for save dirs / results (default adj_type)")
    p.add_argument("--ours_only", action="store_true",
                   help="skip the torch reference side (internal arms, "
                        "e.g. the attention-mode comparison)")
    p.add_argument("--ref_parallel", type=int, default=2)
    p.add_argument("--ours_eval_batch_size", type=int, default=100)
    p.add_argument("--skip_done", action="store_true",
                   help="skip (seed, framework, tag) pairs already present "
                        "in results.jsonl — resume an interrupted campaign")
    p.add_argument("--ref_only", action="store_true",
                   help="run only the torch reference side (e.g. to "
                        "re-drive it while the chip queue runs elsewhere)")
    args = p.parse_args()
    # reference jobs run with cwd=/root/reference — every path handed to
    # them must be absolute
    args.out = os.path.abspath(args.out)
    seeds = [int(s) for s in args.seeds.split(",")]
    os.makedirs(args.out, exist_ok=True)
    results_path = os.path.join(args.out, "results.jsonl")
    done = set()
    if args.skip_done and os.path.exists(results_path):
        with open(results_path) as fh:
            for line in fh:
                try:
                    r = json.loads(line)
                    done.add((r["seed"], r["framework"], r["tag"]))
                except (json.JSONDecodeError, KeyError):
                    pass
    lock = threading.Lock()
    # stage all seeds up front: the ref and ours workers for one seed
    # would otherwise race the tacred->data rename
    for s in seeds:
        stage_data(os.path.join(args.out, f"seed{s}"), s,
                   args.n_train, args.trigger_copies)

    ref_q, ours_q = queue.Queue(), queue.Queue()
    tag = args.tag or args.adj_type
    for s in seeds:
        if not args.ours_only and (s, "reference", tag) not in done:
            ref_q.put((s, "reference", args.adj_type))
        if not args.ref_only and (s, "gcn_tpu", tag) not in done:
            ours_q.put((s, "gcn_tpu", args.adj_type))
    threads = []
    for _ in range(args.ref_parallel):
        t = threading.Thread(target=worker,
                             args=(ref_q, args, lock, results_path))
        t.start()
        threads.append(t)
    # the chip is a single device: ours runs strictly serially
    t = threading.Thread(target=worker,
                         args=(ours_q, args, lock, results_path))
    t.start()
    threads.append(t)
    for t in threads:
        t.join()
    print(json.dumps({"record": "campaign_done", "out": args.out}))


if __name__ == "__main__":
    main()
