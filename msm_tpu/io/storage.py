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
  namespaces with seed-based account rotation and async uploads — over a
  pluggable TRANSPORT:

    * `DirectoryTransport` (default): a directory tree standing in for the
      remote service (this environment has no network egress).
    * `HttpTransport`: a real HTTP object-store client — PUT with
      overwrite semantics and bounded retries, returning the object URL
      like the reference's `upload_grid` (`io.rs:410-465`). Selected by
      `MSM_STORAGE_URL=http://host:port[/prefix]`.

Both run uploads through the bounded async pool (AsyncGridWriter).
"""

from __future__ import annotations

import io as _io
import os
import time
import urllib.error
import urllib.request
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


def _npy_bytes(arr: np.ndarray) -> bytes:
    """Serialize an array to npy-format bytes (the upload payload; the
    on-disk and over-the-wire formats match, so a downloaded object is a
    valid `psi_*_real`/`_imag` file)."""
    buf = _io.BytesIO()
    np.lib.format.write_array(buf, np.ascontiguousarray(arr), version=(1, 0))
    return buf.getvalue()


class DirectoryTransport:
    """Local-directory stand-in for the object store (default transport).

    Objects land at `{root}/{account}/{key}`; the "URL" is that path.
    """

    def __init__(self, root: str):
        self.root = root

    def put_pair(self, account: str, key: str, arr: np.ndarray) -> str:
        account_dir = os.path.join(self.root, account)
        os.makedirs(account_dir, exist_ok=True)
        base = os.path.join(account_dir, key)
        write_complex_pair(base, arr)
        return base

    def object_base(self, account: str, key: str) -> str:
        return os.path.join(self.root, account, key)


class HttpTransport:
    """HTTP object-store client: PUT `{base_url}/{account}/{key}_{plane}`.

    Mirrors the reference's upload semantics (`io.rs:410-465`): uploads
    OVERWRITE existing objects (repeated PUT to the same URL), run inside
    async tasks, and yield the object URL for the caller to record. Bounded
    retries with linear backoff; a transport error after the last attempt
    propagates out of the upload task (surfaces at `writer.wait()`, like
    the reference's unwrap on the joined tokio task).
    """

    def __init__(
        self,
        base_url: str,
        retries: int = 3,
        backoff_s: float = 0.25,
        timeout_s: float = 60.0,
    ):
        self.base_url = base_url.rstrip("/")
        self.retries = int(retries)
        self.backoff_s = float(backoff_s)
        self.timeout_s = float(timeout_s)

    def _put_object(self, url: str, data: bytes) -> None:
        last: Exception | None = None
        for attempt in range(self.retries):
            try:
                req = urllib.request.Request(url, data=data, method="PUT")
                req.add_header("Content-Type", "application/octet-stream")
                with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
                    if 200 <= resp.status < 300:
                        return
                    last = OSError(f"PUT {url} -> HTTP {resp.status}")
            except (urllib.error.URLError, OSError) as e:
                last = e
            if attempt + 1 < self.retries:
                time.sleep(self.backoff_s * (attempt + 1))
        raise OSError(f"upload failed after {self.retries} attempts: {url}") from last

    def put_pair(self, account: str, key: str, arr: np.ndarray) -> str:
        base = self.object_base(account, key)
        arr = np.ascontiguousarray(arr)
        self._put_object(base + "_real", _npy_bytes(arr.real))
        self._put_object(base + "_imag", _npy_bytes(arr.imag))
        return base

    def object_base(self, account: str, key: str) -> str:
        return f"{self.base_url}/{account}/{key}"


def transport_from_env(root: str):
    """Pick the transport: `MSM_STORAGE_URL` selects HTTP (with optional
    `MSM_STORAGE_RETRIES`), else the local directory stand-in."""
    url = os.environ.get("MSM_STORAGE_URL")
    if url:
        return HttpTransport(
            url, retries=int(os.environ.get("MSM_STORAGE_RETRIES", "3"))
        )
    return DirectoryTransport(root)


class ObjectBackend:
    """Remote-storage-shaped backend: accounts + flat keys + rotation.

    `accounts` plays the role of the drive's storage accounts; a stream's
    account is `accounts[seed % len(accounts)]` like the reference's
    round-robin selection (`io.rs:383-401`). Uploads are async and
    overwrite existing objects (`io.rs:427-463`); `submit_grid` returns the
    destination URL (recorded in the run manifest by the driver).
    """

    def __init__(
        self,
        root: str,
        accounts: Sequence[str] = ("account0",),
        writer: Optional[AsyncGridWriter] = None,
        transport=None,
    ):
        self.root = root
        self.accounts = list(accounts)
        self.writer = writer or AsyncGridWriter()
        self._own = writer is None
        self.transport = transport or transport_from_env(root)

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
        account = self.account_for(seed)
        arr = np.ascontiguousarray(arr)
        self.writer.submit_task(lambda: self.transport.put_pair(account, key, arr))
        return self.transport.object_base(account, key)

    def grid_path(
        self, sim_name: str, field: str, dump: int, seed: Optional[int] = None
    ) -> str:
        """Destination base path/URL for a grid (re-reading works for the
        directory transport; HTTP objects are write-side only, like the
        reference's upload path)."""
        key = f"{sim_name}_{field}_{dump:05d}"
        return self.transport.object_base(self.account_for(seed), key)

    def wait(self) -> None:
        self.writer.wait()

    def close(self) -> None:
        if self._own:
            self.writer.close()
