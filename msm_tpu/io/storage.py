"""Pluggable dump-storage backends.

The reference has two compile-time storage paths: local npy dumps and a
decentralized-drive client (`remote-storage` feature,
`simulator/src/utils/io.rs:338-481`) that uploads each grid to a named
storage account — selected round-robin by stream seed (`io.rs:352-408`) —
under flat keys `{sim_name}_psi_{dump:05}` (`simulation_object.rs:1186-1189`).

Here storage is a runtime-pluggable backend:

- `LocalNpyBackend` (default): the reference's local layout,
  `{root}/{sim_name}/psi_{dump:05}_{real,imag}`.
- `ObjectBackend`: the remote-storage shape — flat keys in per-account
  namespaces with seed-based account rotation and async uploads. The
  transport is a directory tree standing in for the remote service (the
  actual decentralized-drive integration is out of scope in this
  environment, which has no network egress); swapping the transport is a
  matter of overriding `_put`.

Both run uploads through the bounded async pool (AsyncGridWriter).
"""

from __future__ import annotations

import os
from typing import Optional, Protocol, Sequence

import numpy as np

from .npy import AsyncGridWriter, write_complex_pair


class StorageBackend(Protocol):
    """Destination for grid dumps."""

    def submit_grid(self, sim_name: str, field: str, dump: int, arr: np.ndarray) -> str:
        """Queue a grid write; returns the destination key/path."""
        ...

    def wait(self) -> None: ...

    def close(self) -> None: ...


class LocalNpyBackend:
    """Reference-compatible local filesystem layout."""

    def __init__(self, data_root: str = "sim-data", writer: Optional[AsyncGridWriter] = None):
        self.data_root = data_root
        self.writer = writer or AsyncGridWriter()
        self._own = writer is None

    def submit_grid(self, sim_name: str, field: str, dump: int, arr: np.ndarray) -> str:
        d = os.path.join(self.data_root, sim_name)
        os.makedirs(d, exist_ok=True)
        base = os.path.join(d, f"{field}_{dump:05d}")
        self.writer.submit(base, arr)
        return base

    def wait(self) -> None:
        self.writer.wait()

    def close(self) -> None:
        if self._own:
            self.writer.close()


class ObjectBackend:
    """Remote-storage-shaped backend: accounts + flat keys + rotation.

    `accounts` plays the role of the drive's storage accounts; a stream's
    account is `accounts[seed % len(accounts)]` like the reference's
    round-robin selection (`io.rs:383-401`). Uploads are async and
    overwrite existing objects (`io.rs:427-463`).
    """

    def __init__(
        self,
        root: str,
        accounts: Sequence[str] = ("account0",),
        writer: Optional[AsyncGridWriter] = None,
    ):
        self.root = root
        self.accounts = list(accounts)
        self.writer = writer or AsyncGridWriter()
        self._own = writer is None

    @classmethod
    def from_config(
        cls, config, root: str, writer: Optional[AsyncGridWriter] = None
    ) -> "ObjectBackend":
        """Build a backend from a `[remote_storage_parameters]` table.

        Mirrors `RemoteStorage::new` (`io.rs:352-408`): the reference lists
        the drive's storage accounts, keeps those whose identifier CONTAINS
        the configured name, and rotates among them by stream seed. Here the
        drive is the `root` directory and accounts are its subdirectories;
        when none match, a single account named `storage_account` is used
        (and created on first upload).
        """
        name = config.storage_account
        matches = []
        if os.path.isdir(root):
            matches = sorted(
                d
                for d in os.listdir(root)
                if name in d and os.path.isdir(os.path.join(root, d))
            )
        return cls(root, matches or [name], writer=writer)

    def account_for(self, seed: Optional[int]) -> str:
        if seed is None:
            return self.accounts[0]
        return self.accounts[seed % len(self.accounts)]

    def submit_grid(
        self,
        sim_name: str,
        field: str,
        dump: int,
        arr: np.ndarray,
        seed: Optional[int] = None,
    ) -> str:
        # flat key, reference naming: {sim_name}_{field}_{dump:05}
        key = f"{sim_name}_{field}_{dump:05d}"
        account_dir = os.path.join(self.root, self.account_for(seed))
        os.makedirs(account_dir, exist_ok=True)
        base = os.path.join(account_dir, key)
        self.writer.submit(base, arr)
        return base

    def grid_path(
        self, sim_name: str, field: str, dump: int, seed: Optional[int] = None
    ) -> str:
        """Destination base path for a grid (for re-reading, e.g. resume)."""
        key = f"{sim_name}_{field}_{dump:05d}"
        return os.path.join(self.root, self.account_for(seed), key)

    def _put(self, base: str, arr: np.ndarray) -> None:
        write_complex_pair(base, arr)

    def wait(self) -> None:
        self.writer.wait()

    def close(self) -> None:
        if self._own:
            self.writer.close()
