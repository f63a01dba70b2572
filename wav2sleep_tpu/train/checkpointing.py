"""Orbax-based training checkpoints (best + last), with resume hardening.

The reference persists: Lightning ModelCheckpoint (top-1 on val_loss +
last), RNG states, gradient-clip config (warning on mismatch at resume), and
scheduler step (src/wav2sleep/trainer/main.py:299-334, scripts/config/
training/callbacks/checkpointing.yaml). This manager checkpoints the full
TrainState (params, optimizer incl. schedule count, EMA), the PRNG key,
early-stopping / plateau controller state and the epoch counter.
"""

from __future__ import annotations

import json
import logging
import os
import shutil

import jax
import numpy as np

logger = logging.getLogger(__name__)


class CheckpointManager:
    def __init__(self, root: str):
        # Orbax/tensorstore requires absolute paths; configs commonly pass a
        # relative log_dir (e.g. ``runs/<name>``).
        self.root = os.path.abspath(root)
        os.makedirs(self.root, exist_ok=True)
        import orbax.checkpoint as ocp

        self._ckptr = ocp.StandardCheckpointer()

    def _meta_path(self, name: str) -> str:
        return os.path.join(self.root, f'{name}.meta.json')

    def save(self, trainer, epoch: int, val_loss: float, is_best: bool) -> None:
        tree = {
            'state': jax.device_get(trainer.state),
            'rng': jax.device_get(trainer.rng),
        }
        if getattr(trainer, '_host_ema', None) is not None:
            tree['host_ema'] = trainer._host_ema
        meta = {
            'epoch': epoch,
            'val_loss': float(val_loss) if np.isfinite(val_loss) else None,
            'grad_clip': trainer.grad_clip,
            'early_stopping': trainer.early_stopping.state_dict(),
            'plateau': trainer.plateau.state_dict() if trainer.plateau else None,
        }
        self._write('last', tree, meta)
        if is_best:
            self._write('best', tree, meta)

    def _write(self, name: str, tree, meta) -> None:
        """Atomic save. Multi-process (TPU pod) discipline: orbax's
        ``Checkpointer.save`` must be called by EVERY process (it runs its
        own internal barriers and primary-host-only writes), while the
        non-orbax filesystem juggling around it — tmp cleanup, the final
        rename, the meta sidecar — must run on rank zero only, fenced by
        global barriers so no process can race ahead into a restore (or the
        next save) while the rename is still in flight on a shared FS."""
        from jax.experimental import multihost_utils

        import jax as _jax

        multi = _jax.process_count() > 1
        from ..utils import is_rank_zero

        path = os.path.join(self.root, name)
        tmp = path + '.tmp'
        if is_rank_zero() and os.path.exists(tmp):
            shutil.rmtree(tmp)
        if multi:
            multihost_utils.sync_global_devices(f'w2s_ckpt_pre_{name}')
        self._ckptr.save(tmp, tree)
        self._ckptr.wait_until_finished()
        if is_rank_zero():
            if os.path.exists(path):
                shutil.rmtree(path)
            os.replace(tmp, path)
            with open(self._meta_path(name), 'w') as f:
                json.dump(meta, f)
        if multi:
            multihost_utils.sync_global_devices(f'w2s_ckpt_post_{name}')

    def _saved_keys(self, path: str) -> set[str] | None:
        """Top-level keys of a saved checkpoint (orbax item metadata), or
        None when metadata is unavailable (older/foreign checkpoints)."""
        try:
            md = self._ckptr.metadata(path)
            return set(md.item_metadata.tree.keys())
        except Exception as e:
            logger.debug(f'checkpoint metadata unavailable for {path}: {e}')
            return None

    def _restore_reconciling_state_ema(self, path: str, template: dict):
        """Restore, reconciling an in-graph ``state.ema_params`` config
        change (EMA toggled between save and resume) — the symmetric case
        of the host_ema reconciliation below. ema_params lives INSIDE the
        state pytree, where orbax item metadata cannot be inspected
        reliably, so this is exception-driven: on a structure mismatch the
        template is retried with ema_params flipped, and if that also
        fails the ORIGINAL error is raised."""
        try:
            return self._ckptr.restore(path, template)
        except Exception as first_err:
            st = template.get('state')
            if st is None or not hasattr(st, 'ema_params'):
                raise
            if st.ema_params is None:
                tmpl = dict(template)
                tmpl['state'] = st.replace(
                    ema_params=jax.tree_util.tree_map(np.array, st.params)
                )
                try:
                    out = self._ckptr.restore(path, tmpl)
                except Exception:
                    raise first_err
                logger.warning(
                    'Checkpoint carries an in-graph EMA but EMA is disabled '
                    'for this run; the EMA weights were ignored.'
                )
                out['state'] = out['state'].replace(ema_params=None)
                return out
            tmpl = dict(template)
            tmpl['state'] = st.replace(ema_params=None)
            try:
                out = self._ckptr.restore(path, tmpl)
            except Exception:
                raise first_err
            logger.warning(
                'Checkpoint has no in-graph EMA entry (saved without EMA); '
                'initialized the EMA from the restored parameters.'
            )
            out['state'] = out['state'].replace(
                ema_params=jax.tree_util.tree_map(np.array, out['state'].params)
            )
            return out

    def restore(self, trainer, which: str = 'last') -> int:
        """Restore into ``trainer``; returns the epoch to resume from."""
        # ``which`` may be a bare name ('last'/'best') under self.root, or a
        # filesystem path to a checkpoint dir. Bare names always resolve
        # under self.root (a stray cwd entry named 'last' must not shadow
        # the run's checkpoint); anything containing a separator is treated
        # as a path.
        # Any separator means "filesystem path" even if it doesn't exist —
        # falling through to root-join would make the FileNotFoundError name
        # a doubly-joined path instead of the one the user typed.
        if os.path.isabs(which) or os.sep in which:
            path = os.path.abspath(which)
        else:
            path = os.path.join(self.root, which)
        meta_path = path + '.meta.json'
        if not os.path.exists(path):
            raise FileNotFoundError(f'No checkpoint at {path}')
        # The state template requires an initialized trainer; build it from
        # one example batch.
        if trainer.state is None:
            loader = trainer.datamodule.train_loader(0)
            example = next(iter(loader))
            trainer._ensure_state(example)
        template = {'state': jax.device_get(trainer.state), 'rng': jax.device_get(trainer.rng)}
        if getattr(trainer, '_host_ema', None) is not None:
            template['host_ema'] = trainer._host_ema
        # Reconcile the template with the checkpoint's actual top-level keys
        # (orbax item metadata) instead of exception-driven retries: a real
        # restore failure (shape/dtype mismatch, corruption) must surface as
        # itself, not as the second attempt's error or a misleading
        # "no host_ema" warning.
        saved_keys = self._saved_keys(path)

        def _restore_seeding_ema():
            # No host_ema entry in the checkpoint (it predates ema_offload):
            # restore without it and seed the host EMA from the restored
            # parameters.
            out = self._restore_reconciling_state_ema(
                path, {k: v for k, v in template.items() if k != 'host_ema'}
            )
            out['host_ema'] = jax.tree_util.tree_map(
                lambda v: np.array(v), out['state'].params
            )
            logger.warning(
                'Checkpoint has no host_ema entry (saved without '
                'ema_offload); initialized the offloaded EMA from the '
                'restored parameters.'
            )
            return out

        def _restore_dropping_ema():
            # Checkpoint carries a host_ema this trainer does not use:
            # restore with a placeholder, then drop it.
            tmpl = dict(template)
            tmpl['host_ema'] = jax.tree_util.tree_map(
                lambda v: np.array(v), template['state'].params
            )
            out = self._restore_reconciling_state_ema(path, tmpl)
            logger.warning(
                'Checkpoint carries an offloaded EMA but ema_offload is '
                'disabled; the EMA weights were ignored.'
            )
            out.pop('host_ema', None)
            return out

        if saved_keys is None:
            # Metadata unavailable (older/foreign checkpoint): we cannot know
            # whether it carries a host_ema entry. Try the full template; if
            # that fails, retry with the template adjusted the other way
            # (seeding or dropping host_ema) — and if the retry fails too,
            # surface the ORIGINAL error, which describes the real problem.
            try:
                restored = self._restore_reconciling_state_ema(path, template)
            except Exception as first_err:
                retry = (
                    _restore_seeding_ema
                    if 'host_ema' in template
                    else _restore_dropping_ema
                )
                try:
                    restored = retry()
                except Exception:
                    raise first_err
        elif 'host_ema' in template and 'host_ema' not in saved_keys:
            restored = _restore_seeding_ema()
        elif 'host_ema' not in template and 'host_ema' in saved_keys:
            restored = _restore_dropping_ema()
        else:
            restored = self._restore_reconciling_state_ema(path, template)
        trainer.state = restored['state']
        trainer.rng = restored['rng']
        if 'host_ema' in restored:
            trainer._host_ema = restored['host_ema']
        if getattr(trainer, 'mesh', None) is not None:
            # The restored tree is host numpy; put it back on the mesh the
            # same way _ensure_state does. On multi-process runs this is
            # REQUIRED (a host-local tree fed to the jitted step would
            # trigger a per-leaf cross-process assert_equal allgather);
            # on single-process meshes it just avoids an implicit reshard
            # on the first post-restore step.
            from ..parallel.mesh import replicate

            trainer.state = replicate(trainer.mesh, trainer.state)
        return self._resume_epoch(trainer, meta_path)

    def _resume_epoch(self, trainer, meta_path: str) -> int:
        """Apply sidecar metadata (epoch, early-stop/plateau state) and return
        the epoch to resume from."""
        epoch = 0
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            epoch = int(meta.get('epoch', -1)) + 1
            if meta.get('grad_clip') != trainer.grad_clip:
                logger.warning(
                    '=' * 70
                    + f'\nGRADIENT CLIPPING MISMATCH DETECTED!\n'
                    f'  Checkpoint trained with: gradient_clip={meta.get("grad_clip")}\n'
                    f'  Current config has:      gradient_clip={trainer.grad_clip}\n'
                    'This can cause training instability (increasing training loss)!\n' + '=' * 70
                )
            if meta.get('early_stopping'):
                trainer.early_stopping.load_state_dict(meta['early_stopping'])
            if meta.get('plateau') and trainer.plateau is not None:
                trainer.plateau.load_state_dict(meta['plateau'])
        path = meta_path[: -len('.meta.json')] if meta_path.endswith('.meta.json') else meta_path
        logger.info(f'Restored checkpoint from {path}; resuming at epoch {epoch}.')
        return epoch
