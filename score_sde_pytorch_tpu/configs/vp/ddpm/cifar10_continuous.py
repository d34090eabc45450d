"""Hyperparameters of reference configs/vp/ddpm/cifar10_continuous.py (declarative form)."""
from score_sde_pytorch_tpu.configs.builder import declare

get_config = declare(
    'cifar10',
    training=dict(sde='vpsde', continuous=True, reduce_mean=True),
    sampling=dict(method='pc', predictor='euler_maruyama', corrector='none'),
    data=dict(centered=True),
    model=dict(name='ddpm', normalization='GroupNorm', nonlinearity='swish', nf=128, attn_resolutions=(16,), resamp_with_conv=True, conditional=True, scale_by_sigma=False, ema_rate=0.9999, ch_mult=(1, 2, 2, 2), num_res_blocks=2),
)
