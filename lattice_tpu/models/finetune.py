"""Fine-tuning driver: mine pairs -> contrastive steps -> save params.

The training subsystem's orchestration layer (the CLI `lattice train`
entry): loads a saved index, mines (NL, code) pairs from it
(`models/data.py`), runs `ContrastiveTrainer` steps on the mesh, and
checkpoints params + loss curve under the index's data dir.
"""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path

import numpy as np

from lattice_tpu.models.data import PairBatcher, mine_pairs
from lattice_tpu.models.train import ContrastiveTrainer
from lattice_tpu.models.unixcoder import UniXcoderConfig
from lattice_tpu.text.tokenizer import CodeTokenizer

logger = logging.getLogger(__name__)


def finetune_from_index(
    code_store, summary_store=None, *,
    data_dir: str | Path,
    config: UniXcoderConfig | None = None,
    mesh=None,
    steps: int = 100,
    batch_size: int = 16,
    max_length: int = 256,
    learning_rate: float = 2e-5,
    seed: int = 0,
    progress=None,
) -> dict:
    """Returns a report dict; saves params + report under data_dir."""
    data_dir = Path(data_dir)
    config = config or UniXcoderConfig()
    pairs = mine_pairs(code_store, summary_store)
    if len(pairs) < batch_size:
        return {"status": "skipped",
                "reason": f"only {len(pairs)} pairs mined "
                          f"(need >= {batch_size})"}
    tokenizer = CodeTokenizer(vocab_size=config.vocab_size)
    batcher = PairBatcher(pairs, tokenizer, batch_size=batch_size,
                          max_length=max_length, seed=seed)
    trainer = ContrastiveTrainer(config, mesh=mesh,
                                 learning_rate=learning_rate, seed=seed)
    losses: list[float] = []
    t0 = time.time()
    step = 0
    while step < steps:
        for batch in batcher.batches():
            loss = trainer.train_step(batch)
            losses.append(loss)
            step += 1
            if progress is not None:
                progress(step, steps, loss)
            if step >= steps:
                break
    elapsed = time.time() - t0
    # checkpoint: flat npz of the param tree
    import jax
    flat = {}
    for path, value in jax.tree_util.tree_flatten_with_path(
            trainer.state.params)[0]:
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        flat[key] = np.asarray(value)
    ckpt_path = data_dir / "finetuned_params.npz"
    data_dir.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(ckpt_path, **flat)
    report = {
        "status": "completed",
        "pairs_mined": len(pairs),
        "steps": step,
        "batch_size": batch_size,
        "first_loss": round(float(losses[0]), 4),
        "last_loss": round(float(losses[-1]), 4),
        "elapsed_s": round(elapsed, 1),
        "checkpoint": str(ckpt_path),
    }
    (data_dir / "finetune_report.json").write_text(json.dumps(report, indent=1))
    return report
