"""Container orchestration for third-party digital decoders.

Same capability surface as the reference backend module (reference
``docker_backend.py``): engine connectivity probing, image inspection,
offline-first image acquisition (local → bundled tar.xz → registry
pull), and a detached run that streams container logs back to a
callback and maps the exit status.

``docker-py`` is imported lazily: the TPU pipeline never needs it, the
test suite injects a mock client, and machines without Docker can still
use everything else in the package.
"""

from __future__ import annotations

import contextlib
import logging
import lzma
import platform
import shutil
import sys
import tempfile
from collections.abc import Callable, Iterable, Sequence
from dataclasses import dataclass, field
from pathlib import Path

LOG = logging.getLogger(__name__)

DEFAULT_IMAGE = "ghcr.io/rknightion/iq-to-audio-backend:latest"
DEFAULT_AUDIO_TARGET = Path("/workspace/audio")

# Bundled image tars shipped per-arch by the desktop packaging job.
_BUNDLE_TAR_BY_ARCH = {
    "x86_64": "backend-amd64.tar.xz",
    "amd64": "backend-amd64.tar.xz",
    "arm64": "backend-arm64.tar.xz",
    "aarch64": "backend-arm64.tar.xz",
}


class DockerBackendError(RuntimeError):
    """Any failure while orchestrating the backend container."""


class DockerConnectionError(DockerBackendError):
    """The Docker engine is unreachable or docker-py is missing."""


class DockerLaunchError(DockerBackendError):
    """The container failed to start, stream, or exited non-zero."""


def _sdk_errors() -> tuple[type[BaseException], ...]:
    """The exception set worth catching around docker SDK calls."""
    try:
        from docker.errors import DockerException
    except ImportError:
        return (OSError,)
    return (DockerException, OSError)


def _errtext(exc: BaseException, fallback: str) -> str:
    return str(exc).strip() or fallback


def default_decoder_command(command: Sequence[str] | None = None) -> tuple[str, ...]:
    """Normalize a decoder command to a tuple, defaulting to dsd-fme."""
    return tuple(command) if command else ("dsd-fme", "--help")


@dataclass(slots=True)
class DockerBackendConfig:
    """Shared settings for the backend container image."""

    image: str = DEFAULT_IMAGE
    audio_mount: Path = DEFAULT_AUDIO_TARGET
    environment: dict[str, str] = field(default_factory=dict)
    auto_remove: bool = True
    tty: bool = True
    stdin_open: bool = True


@dataclass(slots=True)
class DockerLaunchRequest:
    """One decoder invocation: the command plus the host audio directory
    that gets bind-mounted read-write at the configured mount point."""

    command: tuple[str, ...]
    audio_dir: Path
    decoder_key: str = "custom"
    pull_if_missing: bool = True

    def validate(self) -> None:
        if not self.command:
            raise ValueError(
                "Launch request must include a command to execute inside the container."
            )
        if not self.audio_dir.exists():
            raise ValueError(f"Audio directory does not exist: {self.audio_dir}")
        if not self.audio_dir.is_dir():
            raise ValueError(f"Audio path is not a directory: {self.audio_dir}")


@dataclass(slots=True)
class DockerConnectivity:
    available: bool
    message: str


@dataclass(slots=True)
class DockerImageInfo:
    present: bool
    tags: list[str]
    created: str | None
    size_mb: float | None

    def format_status(self) -> str:
        if not self.present:
            return "Image not yet loaded"
        tag = self.tags[0] if self.tags else "unknown"
        size = f"{self.size_mb:.0f} MB" if self.size_mb else "unknown size"
        built = self.created.split("T")[0] if self.created else "unknown date"
        return f"Image: {tag} ({size}, built {built})"


class DockerBackend:
    """docker-py wrapper shared by the CLI ``digital`` subcommand and the
    GUI post-processing tab. Pass ``client=`` to inject a fake in tests."""

    def __init__(self, *, config: DockerBackendConfig | None = None, client=None) -> None:
        self.config = config or DockerBackendConfig()
        self._client = client if client is not None else self._connect()

    @staticmethod
    def _connect():
        try:
            import docker
        except ImportError as exc:
            raise DockerConnectionError(
                "The 'docker' Python package is not installed; digital decoder "
                "hand-off requires docker-py and a running Docker engine."
            ) from exc
        try:
            return docker.from_env()
        except Exception as exc:
            raise DockerConnectionError(
                _errtext(exc, "Unable to create a Docker client.")
            ) from exc

    @property
    def client(self):
        return self._client

    # ---- engine / image state ----

    def probe(self) -> DockerConnectivity:
        try:
            self._client.ping()
            # ping alone can succeed without list permissions
            self._client.containers.list(limit=1)
        except _sdk_errors() as exc:
            msg = _errtext(exc, "Unable to communicate with the Docker engine.")
            LOG.debug("Docker probe failed: %s", msg)
            return DockerConnectivity(False, msg)
        return DockerConnectivity(True, "Docker engine reachable.")

    def ensure_connection(self) -> None:
        state = self.probe()
        if not state.available:
            raise DockerConnectionError(state.message)

    def get_image_info(self) -> DockerImageInfo:
        try:
            img = self._client.images.get(self.config.image)
        except _sdk_errors():
            return DockerImageInfo(present=False, tags=[], created=None, size_mb=None)
        attrs = getattr(img, "attrs", {}) or {}
        nbytes = attrs.get("Size", 0)
        return DockerImageInfo(
            present=True,
            tags=list(getattr(img, "tags", []) or []),
            created=attrs.get("Created"),
            size_mb=nbytes / 2**20 if nbytes else None,
        )

    def pull_image(self) -> None:
        LOG.debug("Pulling backend image %s", self.config.image)
        try:
            self._client.images.pull(self.config.image)
        except _sdk_errors() as exc:  # pragma: no cover - registry-specific
            raise DockerBackendError(
                _errtext(exc, f"Failed to pull {self.config.image}.")
            ) from exc

    # ---- offline-first bundled image ----

    @staticmethod
    def _locate_bundled_tar() -> Path | None:
        if getattr(sys, "frozen", False) and hasattr(sys, "_MEIPASS"):
            root = Path(sys._MEIPASS) / "docker"
        else:
            root = Path(__file__).resolve().parents[2] / "packaging" / "docker"
        name = _BUNDLE_TAR_BY_ARCH.get(platform.machine().lower())
        if name is None:
            LOG.warning(
                "Unsupported architecture for bundled image: %s", platform.machine()
            )
            return None
        candidate = root / name
        return candidate if candidate.exists() else None

    def load_bundled_image(
        self, *, progress_callback: Callable[[str], None] | None = None
    ) -> bool:
        """Decompress + load the bundled tar.xz; False if none is shipped."""
        notify = progress_callback or (lambda _msg: None)
        src = self._locate_bundled_tar()
        if src is None:
            LOG.debug("No bundled Docker image found")
            return False
        LOG.info("Loading bundled Docker image from %s", src)
        notify("Extracting bundled container image...")
        scratch: Path | None = None
        try:
            with tempfile.NamedTemporaryFile(suffix=".tar", delete=False) as tmp:
                scratch = Path(tmp.name)
            with lzma.open(src, "rb") as packed, open(scratch, "wb") as raw:
                shutil.copyfileobj(packed, raw)
            notify("Loading container into Docker...")
            with open(scratch, "rb") as f:
                self._client.images.load(f.read())
        except (lzma.LZMAError, OSError) as exc:
            raise DockerBackendError(
                f"Failed to decompress bundled image: {exc}"
            ) from exc
        except _sdk_errors() as exc:
            raise DockerBackendError(
                f"Failed to load bundled image into Docker: {exc}"
            ) from exc
        finally:
            if scratch is not None:
                with contextlib.suppress(OSError):
                    scratch.unlink()
        LOG.info("Successfully loaded bundled Docker image")
        return True

    def _ensure_image_available(self) -> None:
        """Acquisition order: local image, then bundled tar, then registry."""
        with contextlib.suppress(*_sdk_errors()):
            self._client.images.get(self.config.image)
            return
        LOG.info("Image not found locally, attempting to load from bundled tar...")
        try:
            if self.load_bundled_image():
                return
        except DockerBackendError:
            LOG.warning("Failed to load bundled image, will try pull instead")
        LOG.info("Bundled image unavailable, pulling from registry...")
        self.pull_image()

    # ---- run ----

    def run_and_stream(
        self,
        request: DockerLaunchRequest,
        *,
        log_callback: Callable[[str], None] | None = None,
    ) -> int:
        """Launch detached, stream logs, wait, and map the exit status.

        Raises :class:`DockerLaunchError` on any non-zero exit.
        """
        request.validate()
        if request.pull_if_missing:
            self._ensure_image_available()
        mount = {
            request.audio_dir.resolve().as_posix(): {
                "bind": self.config.audio_mount.as_posix(),
                "mode": "rw",
            }
        }
        LOG.debug(
            "Launching backend container image=%s command=%s audio_dir=%s",
            self.config.image,
            request.command,
            request.audio_dir,
        )
        try:
            container = self._client.containers.run(
                image=self.config.image,
                command=list(request.command),
                detach=True,
                remove=self.config.auto_remove,
                volumes=mount,
                working_dir=self.config.audio_mount.as_posix(),
                environment=self.config.environment or None,
                tty=self.config.tty,
                stdin_open=self.config.stdin_open,
            )
        except _sdk_errors() as exc:
            raise DockerLaunchError(
                _errtext(exc, "Failed to start backend container.")
            ) from exc

        try:
            for line in self._log_lines(container):
                if log_callback is not None:
                    log_callback(line)
                else:
                    LOG.info("%s", line.rstrip("\n"))
        finally:
            outcome = self._await_exit(container)

        code = self._exit_code(outcome.get("StatusCode", 1))
        if code != 0:
            err = outcome.get("Error")
            raise DockerLaunchError(
                str(err).strip()
                if err
                else f"Backend container exited with status {code}."
            )
        return code

    def _log_lines(self, container) -> Iterable[str]:
        try:
            stream = container.attach(stream=True, stdout=True, stderr=True, logs=True)
        except _sdk_errors() as exc:
            raise DockerLaunchError(
                _errtext(exc, "Unable to attach to backend container.")
            ) from exc
        for raw in stream:
            if isinstance(raw, bytes):
                yield raw.decode("utf-8", errors="replace")
            else:
                yield str(raw)

    def _await_exit(self, container) -> dict[str, object]:
        try:
            return dict(container.wait())
        except _sdk_errors() as exc:
            raise DockerLaunchError(
                _errtext(exc, "Failed while waiting for container exit.")
            ) from exc
        finally:
            if not self.config.auto_remove:
                with contextlib.suppress(Exception):
                    container.remove(force=True)

    @staticmethod
    def _exit_code(value: object) -> int:
        if isinstance(value, bool):
            return int(value)
        if isinstance(value, (int, float)):
            return int(value)
        if isinstance(value, str):
            try:
                return int(value)
            except ValueError:
                return 1
        return 1
