"""Serving controller: worker registry + heartbeat expiry + dispatch +
streaming proxy (aiohttp).

Drop-in HTTP surface parity with the reference controller (reference
serve/controller.py:238-281 routes; :24,52-56,182-190 heartbeat expiry;
:120-170 lottery/shortest-queue dispatch; :192-214 streaming proxy) —
rebuilt on aiohttp because this image ships no FastAPI/uvicorn.
"""

from __future__ import annotations

import argparse
import asyncio
import dataclasses
import json
import logging
import time
from enum import Enum, auto

import aiohttp
from aiohttp import web

from mllm_npu_tpu.serve.serve_utils import build_logger, server_error_msg

logger = logging.getLogger("controller")

CONTROLLER_HEART_BEAT_EXPIRATION = 30


class DispatchMethod(Enum):
    LOTTERY = auto()
    SHORTEST_QUEUE = auto()

    @classmethod
    def from_str(cls, name: str) -> "DispatchMethod":
        if name == "lottery":
            return cls.LOTTERY
        if name == "shortest_queue":
            return cls.SHORTEST_QUEUE
        raise ValueError(f"invalid dispatch method: {name}")


@dataclasses.dataclass
class WorkerInfo:
    model_names: list
    speed: float
    queue_length: int
    check_heart_beat: bool
    last_heart_beat: float


class Controller:
    def __init__(self, dispatch_method: str = "shortest_queue"):
        self.worker_info: dict[str, WorkerInfo] = {}
        self.dispatch_method = DispatchMethod.from_str(dispatch_method)

    def register_worker(self, worker_name: str, check_heart_beat: bool,
                        worker_status: dict | None) -> bool:
        if worker_status is None:
            worker_status = {"model_names": [worker_name], "speed": 1,
                             "queue_length": 0}
        self.worker_info[worker_name] = WorkerInfo(
            model_names=worker_status["model_names"],
            speed=worker_status.get("speed", 1),
            queue_length=worker_status.get("queue_length", 0),
            check_heart_beat=check_heart_beat,
            last_heart_beat=time.time())
        logger.info("registered worker %s", worker_name)
        return True

    def receive_heart_beat(self, worker_name: str, queue_length: int
                           ) -> bool:
        if worker_name not in self.worker_info:
            return False
        info = self.worker_info[worker_name]
        info.queue_length = queue_length
        info.last_heart_beat = time.time()
        return True

    def remove_stale_workers(self) -> None:
        expire = time.time() - CONTROLLER_HEART_BEAT_EXPIRATION
        stale = [name for name, info in self.worker_info.items()
                 if info.check_heart_beat and info.last_heart_beat < expire]
        for name in stale:
            logger.info("expiring stale worker %s", name)
            self.worker_info.pop(name, None)

    def list_models(self) -> list:
        names = set()
        for info in self.worker_info.values():
            names.update(info.model_names)
        return sorted(names)

    def get_worker_address(self, model_name: str) -> str:
        import random
        candidates = [(n, i) for n, i in self.worker_info.items()
                      if model_name in i.model_names]
        if not candidates:
            return ""
        if self.dispatch_method == DispatchMethod.LOTTERY:
            weights = [i.speed for _, i in candidates]
            return random.choices([n for n, _ in candidates],
                                  weights=weights)[0]
        # shortest queue, normalized by speed
        name, info = min(candidates,
                         key=lambda x: x[1].queue_length / max(x[1].speed,
                                                               1e-6))
        info.queue_length += 1
        return name

    def worker_api_get_status(self) -> dict:
        return {
            "model_names": self.list_models(),
            "speed": 1,
            "queue_length": sum(i.queue_length
                                for i in self.worker_info.values()),
        }


def create_app(controller: Controller) -> web.Application:
    app = web.Application()

    async def register_worker(request: web.Request):
        data = await request.json()
        ok = controller.register_worker(
            data["worker_name"], data["check_heart_beat"],
            data.get("worker_status"))
        return web.json_response({"exist": ok})

    async def refresh_all_workers(request: web.Request):
        controller.remove_stale_workers()
        return web.json_response({})

    async def list_models(request: web.Request):
        controller.remove_stale_workers()
        return web.json_response({"models": controller.list_models()})

    async def get_worker_address(request: web.Request):
        data = await request.json()
        controller.remove_stale_workers()
        addr = controller.get_worker_address(data["model"])
        return web.json_response({"address": addr})

    async def receive_heart_beat(request: web.Request):
        data = await request.json()
        exist = controller.receive_heart_beat(data["worker_name"],
                                              data["queue_length"])
        return web.json_response({"exist": exist})

    async def worker_generate(request: web.Request):
        """Proxy-stream from the dispatched worker (b'\\0'-delimited
        chunks, reference controller.py:192-214)."""
        params = await request.json()
        controller.remove_stale_workers()
        addr = controller.get_worker_address(params.get("model", ""))
        resp = web.StreamResponse()
        await resp.prepare(request)
        if not addr:
            ret = {"text": server_error_msg, "error_code": 2}
            await resp.write(json.dumps(ret).encode() + b"\0")
            return resp
        try:
            timeout = aiohttp.ClientTimeout(total=600)
            async with aiohttp.ClientSession(timeout=timeout) as sess:
                async with sess.post(addr + "/worker_generate",
                                     json=params) as r:
                    async for chunk in r.content.iter_any():
                        await resp.write(chunk)
        except Exception:  # noqa: BLE001
            ret = {"text": server_error_msg, "error_code": 3}
            await resp.write(json.dumps(ret).encode() + b"\0")
        return resp

    async def worker_get_status(request: web.Request):
        return web.json_response(controller.worker_api_get_status())

    app.router.add_post("/register_worker", register_worker)
    app.router.add_post("/refresh_all_workers", refresh_all_workers)
    app.router.add_post("/list_models", list_models)
    app.router.add_post("/get_worker_address", get_worker_address)
    app.router.add_post("/receive_heart_beat", receive_heart_beat)
    app.router.add_post("/worker_generate", worker_generate)
    app.router.add_post("/worker_get_status", worker_get_status)
    return app


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--host", type=str, default="0.0.0.0")
    parser.add_argument("--port", type=int, default=10075)
    parser.add_argument("--dispatch-method", type=str,
                        choices=["lottery", "shortest_queue"],
                        default="shortest_queue")
    args = parser.parse_args()
    build_logger("controller", "controller.log")
    controller = Controller(args.dispatch_method)
    web.run_app(create_app(controller), host=args.host, port=args.port)


if __name__ == "__main__":
    main()
