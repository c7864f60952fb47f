"""CLI entrypoint: `python run.py --cfg configs/ho3d.yaml`.

Capability parity with /root/reference/hand/run.py:1-22: parse the yacs-style
config, seed, build the experiment, dispatch on training.mode
(baseline_VAE -> train, eval -> evaluate a checkpoint).
"""


from mhentropy_tpu.train.engine import Experiment
from mhentropy_tpu.utils.config import parse_args


def main(argv=None):
    from mhentropy_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    cfg, _ = parse_args(argv)
    exp = Experiment(cfg)
    try:
        if cfg.training.mode == "baseline_VAE":
            exp.train_baseline()
        elif cfg.training.mode == "eval":
            exp.eval(name=cfg.training.pth)
        else:
            raise NotImplementedError(cfg.training.mode)
    except BaseException:
        exp.close()
        raise
    # Returned OPEN: programmatic callers may keep training/evaluating
    # (close() releases the TB writer + log handlers — caller's job now).
    return exp


if __name__ == "__main__":
    main().close()
