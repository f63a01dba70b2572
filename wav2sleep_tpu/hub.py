"""Hugging Face Hub integration.

Same artifact contract as the reference (src/wav2sleep/hub.py:10-110):
checkpoint repos hold ``config.yaml`` + ``state_dict.pth`` (+ README), URIs
use the ``hf://`` scheme, and a model card is generated from the variant
registry. Downloads are restricted to the checkpoint artifacts (plus the
JAX-native ``params.npz`` alternative weight file).
"""

from __future__ import annotations

from typing import Optional

MODEL_VARIANTS = {
    'wav2sleep': {
        'signals': ['ECG', 'PPG', 'ABD', 'THX'],
        'num_classes': 4,
        'causal': False,
        'description': 'Cardio-respiratory sleep staging (4-class: Wake, Light, Deep, REM)',
    },
    'wav2sleep-eog': {
        'signals': ['EOG-L', 'EOG-R'],
        'num_classes': 5,
        'causal': False,
        'description': 'EOG-based sleep staging (5-class: Wake, N1, N2, N3, REM)',
    },
}


def is_hf_repo_id(path_or_repo: str) -> bool:
    """True for ``hf://user/repo`` URIs."""
    return path_or_repo.startswith('hf://')


def download_from_hub(
    repo_id: str,
    revision: Optional[str] = None,
    cache_dir: Optional[str] = None,
) -> str:
    """Download a checkpoint repo (config + weights + README only); returns
    the local snapshot folder. ``params.npz`` is the JAX-native weight
    format ``save_checkpoint_folder`` writes on torch-less hosts — hf://
    repos holding it must stay loadable."""
    from huggingface_hub import snapshot_download

    if repo_id.startswith('hf://'):
        repo_id = repo_id[5:]
    return snapshot_download(
        repo_id=repo_id,
        revision=revision,
        cache_dir=cache_dir,
        allow_patterns=['config.yaml', 'state_dict.pth', 'params.npz', 'README.md'],
    )


def upload_to_hub(
    local_folder: str,
    repo_id: str,
    variant_name: Optional[str] = None,
    private: bool = False,
    token: Optional[str] = None,
) -> str:
    """Upload a checkpoint folder; optionally attach a generated model card."""
    from huggingface_hub import HfApi

    api = HfApi(token=token)
    api.create_repo(repo_id=repo_id, exist_ok=True, private=private)
    api.upload_folder(
        folder_path=local_folder,
        repo_id=repo_id,
        allow_patterns=['config.yaml', 'state_dict.pth', 'params.npz'],
    )
    if variant_name:
        model_card = generate_model_card(variant_name)
        api.upload_file(
            path_or_fileobj=model_card.encode('utf-8'),
            path_in_repo='README.md',
            repo_id=repo_id,
        )
    return f'https://huggingface.co/{repo_id}'


def generate_model_card(variant_name: str) -> str:
    """Markdown model card with HF frontmatter for a known variant."""
    if variant_name not in MODEL_VARIANTS:
        raise ValueError(f"Unknown variant '{variant_name}'. Valid variants: {list(MODEL_VARIANTS.keys())}")
    variant = MODEL_VARIANTS[variant_name]
    signals = variant['signals']
    if 'EOG-L' in signals:
        signal_desc = 'electrooculography (EOG)'
    else:
        signal_desc = 'cardio-respiratory signals (ECG, PPG, respiratory)'
    causal_desc = 'Causal (real-time capable)' if variant['causal'] else 'Non-causal (bidirectional)'

    return f"""---
license: mit
tags:
  - sleep-staging
  - wav2sleep
  - polysomnography
  - time-series
  - jax
library_name: wav2sleep-tpu
pipeline_tag: other
---

# {variant_name}

{variant['description']}

## Model Description

A **wav2sleep** model for automatic sleep stage classification from
{signal_desc}: a unified multi-modal network that accepts any subset of its
training modalities at inference time. This checkpoint is served by the
TPU-native JAX implementation (`wav2sleep_tpu`); the weights are stored in
the original PyTorch `state_dict.pth` format and remain loadable by the
upstream PyTorch implementation.

- **Paper**: [wav2sleep: A Unified Multi-Modal Approach to Sleep Stage Classification](https://arxiv.org/abs/2411.04644)
- **Architecture**: {causal_desc}
- **Input Signals**: {', '.join(signals)}
- **Output Classes**: {variant['num_classes']}

### Signal Specifications

| Signal | Samples per 30s epoch |
|--------|----------------------|
| ECG, PPG | 1,024 |
| ABD, THX | 256 |
| EOG-L, EOG-R | 4,096 |

## Usage

```python
from wav2sleep_tpu import load_model, predict_on_folder

model = load_model("hf://joncarter/{variant_name}")
predict_on_folder(
    input_folder="/path/to/edf_files",
    output_folder="/path/to/predictions",
    model=model,
)
```

## Citation

```bibtex
@misc{{carter2024wav2sleep,
    title={{wav2sleep: A Unified Multi-Modal Approach to Sleep Stage Classification from Physiological Signals}},
    author={{Jonathan F. Carter and Lionel Tarassenko}},
    year={{2024}},
    eprint={{2411.04644}},
    archivePrefix={{arXiv}},
    primaryClass={{cs.LG}},
}}
```

## License

MIT
"""
