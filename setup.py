from setuptools import find_packages, setup

setup(
    name='hcpdiff-tpu',
    version='0.1.0',
    description='TPU-native (JAX/XLA/Pallas) Stable-Diffusion toolbox: '
                'yaml-driven training (LoRA, prompt tuning, DreamArtist++, '
                'ControlNet) and inference for SD1.5/SD2.x/SDXL',
    packages=find_packages(exclude=('tests',)),
    python_requires='>=3.10',
    install_requires=[
        'jax', 'flax', 'optax', 'orbax-checkpoint', 'einops', 'numpy',
        'pyyaml', 'safetensors', 'pillow',
    ],
    extras_require={
        'interop': ['torch', 'transformers'],
        'loggers': ['tensorboard', 'wandb'],
    },
    entry_points={
        'console_scripts': [
            'hcpinit = hcpdiff_tpu.tools.init_proj:main',
            'hcp-train = hcpdiff_tpu.trainer.trainer:main',
            'hcp-vis = hcpdiff_tpu.infer.visualizer:main',
        ],
    },
)
