"""Chat UI + worker client (reference serve/gradio_app.py).

``request_from_worker`` posts the reference JSON schema
{input_text, image (b64), image_gen} and parses the b'\\0'-delimited
stream (reference gradio_app.py:61-101). The UI uses gradio when
installed; otherwise a single-file HTML chat served by aiohttp keeps
the demo runnable in this image.
"""

from __future__ import annotations

import argparse
import base64
import io
import json
from typing import Optional

import requests


def request_from_worker(worker_addr: str, input_text: str,
                        image_b64: Optional[str] = None,
                        image_gen: bool = False, timeout: int = 600
                        ) -> dict:
    payload = {"input_text": input_text, "image": image_b64,
               "image_gen": image_gen}
    r = requests.post(worker_addr + "/worker_generate", json=payload,
                      stream=True, timeout=timeout)
    result = {}
    for chunk in r.iter_lines(delimiter=b"\0"):
        if chunk:
            result = json.loads(chunk.decode("utf-8"))
    return result


_HTML = """<!doctype html>
<html><head><title>mllm-tpu chat</title></head>
<body>
<h2>mllm-tpu demo</h2>
<textarea id="txt" rows="3" cols="80"></textarea><br/>
<input type="file" id="img"/><label><input type="checkbox" id="gen"/>
 image generation</label>
<button onclick="send()">Send</button>
<pre id="out"></pre>
<img id="outimg" style="max-width:512px"/>
<script>
async function send() {
  const txt = document.getElementById('txt').value;
  const gen = document.getElementById('gen').checked;
  const fileEl = document.getElementById('img');
  let image = null;
  if (fileEl.files.length) {
    const buf = await fileEl.files[0].arrayBuffer();
    image = btoa(String.fromCharCode(...new Uint8Array(buf)));
  }
  const r = await fetch('/api/generate', {method: 'POST',
    headers: {'Content-Type': 'application/json'},
    body: JSON.stringify({input_text: txt, image: image, image_gen: gen})});
  const data = await r.json();
  document.getElementById('out').textContent = data.text || '';
  if (data.image) {
    document.getElementById('outimg').src = 'data:image/jpeg;base64,' + data.image;
  }
}
</script>
</body></html>"""


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--host", type=str, default="0.0.0.0")
    parser.add_argument("--port", type=int, default=7860)
    parser.add_argument("--worker-address", type=str,
                        default="http://localhost:40000")
    args = parser.parse_args()

    try:
        import gradio  # noqa: F401
        _run_gradio(args)
        return
    except ImportError:
        pass

    from aiohttp import web

    async def index(request):
        return web.Response(text=_HTML, content_type="text/html")

    async def api_generate(request):
        params = await request.json()
        result = request_from_worker(
            args.worker_address, params.get("input_text", ""),
            params.get("image"), params.get("image_gen", False))
        return web.json_response(result)

    app = web.Application(client_max_size=64 * 1024 * 1024)
    app.router.add_get("/", index)
    app.router.add_post("/api/generate", api_generate)
    web.run_app(app, host=args.host, port=args.port)


def _run_gradio(args):
    import gradio as gr

    def chat(text, image, image_gen):
        image_b64 = None
        if image is not None:
            buf = io.BytesIO()
            image.save(buf, format="JPEG")
            image_b64 = base64.b64encode(buf.getvalue()).decode()
        result = request_from_worker(args.worker_address, text, image_b64,
                                     image_gen)
        out_img = None
        if result.get("image"):
            out_img = base64.b64decode(result["image"])
        return result.get("text", ""), out_img

    demo = gr.Interface(
        fn=chat,
        inputs=[gr.Textbox(label="prompt"), gr.Image(type="pil"),
                gr.Checkbox(label="image generation")],
        outputs=[gr.Textbox(label="response"), gr.Image()],
        title="mllm-tpu")
    demo.launch(server_name=args.host, server_port=args.port)


if __name__ == "__main__":
    main()
