"""One-off chip probe: fused decode+MSE kernel vs remat harvest arm."""
import sys, time
import numpy as np
sys.path.insert(0, "/root/repo")

def log(m): print(m, file=sys.stderr, flush=True)

def main():
    import jax
    from bench import measure_train_step
    from rlvae_tpu.geometry import load_metric
    log(f"device: {jax.devices()[0]}")
    metric = load_metric("data/pretrained/metric.npz")
    stable = dict(flow_direction="sampling", flow_loss_mode="volume",
                  flow_log_var_bias_init=0.0)
    arms = {
        "remat+bf16": dict(stable, remat_decode=True,
                           decoder_config={"out_dtype": "bfloat16"}),
        "fused": dict(stable, fused_decode_mse=True),
        "fused+bf16dec": dict(stable, fused_decode_mse=True,
                              decoder_config={"out_dtype": "bfloat16"}),
    }
    for b, reps in ((512, 10), (4096, 4)):
        for name, over in arms.items():
            ms = measure_train_step(metric, batch=b, reps=reps, **over)
            log(f"B={b} {name:14s}: {ms:8.2f} ms")
    # TPU-shaped config (latent 128 / hidden 512, gaussian posterior)
    for b, reps in ((512, 10), (4096, 4)):
        for name, over in arms.items():
            ms = measure_train_step(None, batch=b, reps=reps,
                                    latent_dim=128, flow_hidden_size=512, **over)
            log(f"TPU-shaped B={b} {name:14s}: {ms:8.2f} ms")

if __name__ == "__main__":
    main()
