"""Elastic launch / preemption handling.

TPU-native counterpart of the reference's Modal orchestration
(reference: modal_main.py:5-51): the reference counts pre-emptions in a
``modal.Dict`` and relies on Modal restarting the 24h-timeout function,
with filename-based auto-resume doing the rest. Here the same semantics
run anywhere: a file-backed restart tracker (persistent across
preemptions when placed on durable storage), a supervised retry loop
that relaunches training after crashes/preemptions, and the trainer's
own ``step_N`` auto-resume (training/train.py) continuing from the last
checkpoint.

CLI: ``python -m pl_bert_tpu.training.orchestrate --config_path ...
--run_name ... [--max_restarts N]``.
"""

from __future__ import annotations

import argparse
import json
import os
import time
import traceback


class RestartTracker:
    """File-backed preemption counter (reference: modal_main.py:9-18)."""

    def __init__(self, state_path: str) -> None:
        self.state_path = state_path

    def track(self) -> int:
        state = {}
        if os.path.exists(self.state_path):
            try:
                with open(self.state_path) as f:
                    state = json.load(f)
            except (OSError, ValueError):
                state = {}
        if "count" not in state:
            count = 0
            print(f"Starting first time. preemption_count={count}")
        else:
            count = int(state["count"]) + 1
            print(f"Restarting after pre-emption. preemption_count={count}")
        state["count"] = count
        state["last_start"] = time.time()
        os.makedirs(os.path.dirname(os.path.abspath(self.state_path)), exist_ok=True)
        with open(self.state_path, "w") as f:
            json.dump(state, f)
        return count


def launch(
    args: dict,
    max_restarts: int = 100,
    restart_delay: float = 10.0,
    train_fn=None,
) -> int:
    """Supervised training loop: restart (with auto-resume) after any
    crash/preemption, up to ``max_restarts`` times."""
    from pl_bert_tpu.config import Config
    from pl_bert_tpu.training.train import train

    train_fn = train_fn or train
    config = Config.load(args["config_path"])
    run_dir = os.path.join(config.training_params.output_dir, args["run_name"])
    tracker = RestartTracker(os.path.join(run_dir, "restart_tracker.json"))

    attempts = 0
    while True:
        tracker.track()
        try:
            return train_fn(args)
        except KeyboardInterrupt:
            raise
        except Exception:
            attempts += 1
            traceback.print_exc()
            if attempts > max_restarts:
                print(f"Giving up after {max_restarts} restarts")
                raise
            print(
                f"Training attempt {attempts} failed; restarting in "
                f"{restart_delay}s (auto-resume from latest step_N)"
            )
            time.sleep(restart_delay)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="Elastic PL-BERT training launch")
    parser.add_argument("--config_path", type=str, default="configs/config.yml")
    parser.add_argument("--run_name", type=str, default="default")
    parser.add_argument("--max_restarts", type=int, default=100)
    parser.add_argument("--restart_delay", type=float, default=10.0)
    a = parser.parse_args(argv)
    launch(
        {"config_path": a.config_path, "run_name": a.run_name},
        max_restarts=a.max_restarts,
        restart_delay=a.restart_delay,
    )


if __name__ == "__main__":
    main()
