"""Hyperparameters of reference configs/ve/ncsn/celeba_124.py (declarative form)."""
from score_sde_pytorch_tpu.configs.builder import declare

get_config = declare(
    'celeba',
    training=dict(sde='vesde', continuous=False),
    sampling=dict(method='pc', predictor='none', corrector='ald', n_steps_each=5, snr=0.128),
    model=dict(name='ncsn', scale_by_sigma=False, normalization='InstanceNorm++', nonlinearity='elu', nf=128, interpolation='bilinear', num_scales=500, ema_rate=0.),
    optim=dict(weight_decay=0, optimizer='Adam', lr=1e-3, beta1=0.9, amsgrad=False, eps=1e-8, warmup=0, grad_clip=-1.),
)
