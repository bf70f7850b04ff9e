"""Docker backend + digital CLI with a mocked docker client
(reference tests/test_docker_backend.py + test_cli_digital.py analogues —
no docker engine or docker-py needed)."""

from __future__ import annotations

from types import SimpleNamespace
from unittest.mock import MagicMock

import pytest

from iq_to_audio_tpu.post.digital import DEFAULT_DECODER_KEY, DIGITAL_DECODERS, get_decoder
from iq_to_audio_tpu.post.docker_backend import (
    DEFAULT_IMAGE,
    DockerBackend,
    DockerBackendConfig,
    DockerConnectionError,
    DockerLaunchError,
    DockerLaunchRequest,
)


def make_client(exit_code=0, logs=(b"line one\n", b"line two\n")):
    client = MagicMock()
    container = MagicMock()
    container.attach.return_value = iter(logs)
    container.wait.return_value = {"StatusCode": exit_code}
    client.containers.run.return_value = container
    client.images.get.return_value = SimpleNamespace(
        tags=["ghcr.io/x:latest"], attrs={"Created": "2026-01-01T00:00:00", "Size": 1 << 20}
    )
    return client, container


class TestRegistry:
    def test_presets(self):
        keys = {d.key for d in DIGITAL_DECODERS}
        assert keys == {"dsd-fme", "multimon-ng", "ft8"}
        assert DEFAULT_DECODER_KEY == "dsd-fme"
        assert get_decoder("multimon-ng").default_command[0] == "multimon-ng"
        with pytest.raises(KeyError):
            get_decoder("nope")


class TestBackend:
    def test_probe_ok(self):
        client, _ = make_client()
        backend = DockerBackend(client=client)
        conn = backend.probe()
        assert conn.available

    def test_probe_failure(self):
        client, _ = make_client()
        client.ping.side_effect = OSError("no socket")
        backend = DockerBackend(client=client)
        conn = backend.probe()
        assert not conn.available
        with pytest.raises(DockerConnectionError):
            backend.ensure_connection()

    def test_image_info(self):
        client, _ = make_client()
        backend = DockerBackend(client=client)
        info = backend.get_image_info()
        assert info.present
        assert "MB" in info.format_status()

    def test_run_and_stream(self, tmp_path):
        client, container = make_client()
        backend = DockerBackend(
            config=DockerBackendConfig(image=DEFAULT_IMAGE), client=client
        )
        request = DockerLaunchRequest(
            command=("dsd-fme", "--help"), audio_dir=tmp_path, decoder_key="dsd-fme"
        )
        lines = []
        code = backend.run_and_stream(request, log_callback=lines.append)
        assert code == 0
        assert lines == ["line one\n", "line two\n"]
        _, kwargs = client.containers.run.call_args
        assert kwargs["command"] == ["dsd-fme", "--help"]
        assert kwargs["working_dir"] == "/workspace/audio"
        volumes = kwargs["volumes"]
        assert list(volumes.values())[0]["bind"] == "/workspace/audio"

    def test_nonzero_exit_raises(self, tmp_path):
        client, _ = make_client(exit_code=3)
        backend = DockerBackend(client=client)
        request = DockerLaunchRequest(command=("x",), audio_dir=tmp_path)
        with pytest.raises(DockerLaunchError, match="status 3"):
            backend.run_and_stream(request)

    def test_request_validation(self, tmp_path):
        with pytest.raises(ValueError, match="command"):
            DockerLaunchRequest(command=(), audio_dir=tmp_path).validate()
        with pytest.raises(ValueError, match="does not exist"):
            DockerLaunchRequest(command=("x",), audio_dir=tmp_path / "nope").validate()
        f = tmp_path / "file.txt"
        f.write_text("x")
        with pytest.raises(ValueError, match="not a directory"):
            DockerLaunchRequest(command=("x",), audio_dir=f).validate()


class TestDigitalCli:
    def test_missing_dir_errors(self, tmp_path):
        from iq_to_audio_tpu.cli import main

        rc = main(["digital", "--audio-dir", str(tmp_path / "missing")])
        assert rc == 1

    def test_launch_plumbing(self, tmp_path, monkeypatch):
        import iq_to_audio_tpu.cli as cli_mod
        from iq_to_audio_tpu.post import docker_backend as db

        client, container = make_client()
        captured = {}

        class FakeBackend(DockerBackend):
            def __init__(self, *, config=None, client_=client):
                super().__init__(config=config, client=client_)
                captured["backend"] = self

        monkeypatch.setattr(db, "DockerBackend", FakeBackend)
        rc = cli_mod.main(
            ["digital", "--audio-dir", str(tmp_path), "--decoder", "multimon-ng"]
        )
        assert rc == 0
        _, kwargs = client.containers.run.call_args
        assert kwargs["command"][0] == "multimon-ng"

    def test_custom_command_passthrough(self, tmp_path, monkeypatch):
        import iq_to_audio_tpu.cli as cli_mod
        from iq_to_audio_tpu.post import docker_backend as db

        client, _ = make_client()

        class FakeBackend(DockerBackend):
            def __init__(self, *, config=None):
                super().__init__(config=config, client=client)

        monkeypatch.setattr(db, "DockerBackend", FakeBackend)
        rc = cli_mod.main(
            ["digital", "--audio-dir", str(tmp_path), "--", "dsd-fme", "-i", "x.wav"]
        )
        assert rc == 0
        _, kwargs = client.containers.run.call_args
        assert kwargs["command"] == ["dsd-fme", "-i", "x.wav"]
