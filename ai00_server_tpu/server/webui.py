"""Built-in minimal WebUI (reference serves a zip SPA, main.rs:313-316;
that asset is a git-lfs stub in the snapshot, so we ship a small
self-contained chat + completion page wired to the SSE APIs)."""

WEBUI_HTML = """<!DOCTYPE html>
<html>
<head>
<meta charset="utf-8"/>
<title>ai00_server_tpu</title>
<style>
body { font-family: system-ui, sans-serif; max-width: 860px; margin: 2rem auto;
       background: #111; color: #eee; padding: 0 1rem; }
h1 { font-size: 1.2rem; } a { color: #8cf; }
#log { border: 1px solid #333; border-radius: 8px; padding: 1rem;
       min-height: 14rem; white-space: pre-wrap; }
.msg-user { color: #8cf; } .msg-bot { color: #afa; }
textarea, input, select { background: #222; color: #eee; border: 1px solid #444;
       border-radius: 6px; padding: .5rem; width: 100%; box-sizing: border-box; }
button { background: #2a6; color: #fff; border: 0; border-radius: 6px;
       padding: .5rem 1.2rem; margin-top: .5rem; cursor: pointer; }
.row { display: flex; gap: .6rem; margin: .6rem 0; }
.row > * { flex: 1; }
small { color: #888; }
</style>
</head>
<body>
<h1>ai00_server_tpu <small>— OpenAI-compatible RWKV serving on TPU
(<a href="/api-docs">API docs</a>)</small></h1>
<div id="info"><small>loading model info…</small></div>
<div id="log"></div>
<div class="row">
  <textarea id="inp" rows="2" placeholder="Say something…"></textarea>
</div>
<div class="row">
  <select id="mode"><option value="chat">chat</option>
  <option value="completion">completion</option></select>
  <input id="max_tokens" type="number" value="256" title="max_tokens"/>
  <input id="temperature" type="number" value="1.0" step="0.1"
   title="temperature"/>
  <input id="top_p" type="number" value="0.5" step="0.05" title="top_p"/>
  <button id="send">Send</button>
</div>
<script>
const log = document.getElementById('log');
const history = [];
async function refreshInfo() {
  try {
    const r = await fetch('/api/models/info');
    const j = await r.json();
    document.getElementById('info').innerHTML = j.state === 'loaded'
      ? `<small>model: ${j.reload.model_path} (${j.model.version}, ` +
        `${j.model.num_layer}L/${j.model.num_emb}C)</small>`
      : '<small>no model loaded</small>';
  } catch (e) {}
}
refreshInfo(); setInterval(refreshInfo, 10000);

async function send() {
  const inp = document.getElementById('inp');
  const text = inp.value.trim(); if (!text) return;
  inp.value = '';
  const mode = document.getElementById('mode').value;
  log.innerHTML += `<span class="msg-user">You: ${text}</span>\\n`;
  const botSpan = document.createElement('span');
  botSpan.className = 'msg-bot';
  botSpan.textContent = 'AI: ';
  log.appendChild(botSpan); log.appendChild(document.createTextNode('\\n'));
  const body = mode === 'chat' ? {
    messages: [...history, {role: 'user', content: text}],
    stream: true,
    max_tokens: +document.getElementById('max_tokens').value,
    temperature: +document.getElementById('temperature').value,
    top_p: +document.getElementById('top_p').value,
  } : {
    prompt: text, stream: true,
    max_tokens: +document.getElementById('max_tokens').value,
    temperature: +document.getElementById('temperature').value,
    top_p: +document.getElementById('top_p').value,
  };
  const url = mode === 'chat' ? '/api/oai/chat/completions'
                              : '/api/oai/completions';
  const resp = await fetch(url, {method: 'POST',
    headers: {'Content-Type': 'application/json'},
    body: JSON.stringify(body)});
  const reader = resp.body.getReader();
  const dec = new TextDecoder();
  let buf = '', out = '';
  for (;;) {
    const {done, value} = await reader.read();
    if (done) break;
    buf += dec.decode(value, {stream: true});
    const lines = buf.split('\\n'); buf = lines.pop();
    for (const line of lines) {
      if (!line.startsWith('data: ')) continue;
      const payload = line.slice(6);
      if (payload === '[DONE]') continue;
      try {
        const j = JSON.parse(payload);
        const c = j.choices && j.choices[0];
        const t = c && (c.text !== undefined ? c.text
                  : (c.delta && c.delta.content) || '');
        if (t) { out += t; botSpan.textContent = 'AI: ' + out; }
      } catch (e) {}
    }
    log.scrollTop = log.scrollHeight;
  }
  if (mode === 'chat') {
    history.push({role: 'user', content: text},
                 {role: 'assistant', content: out});
  }
}
document.getElementById('send').onclick = send;
document.getElementById('inp').addEventListener('keydown', e => {
  if (e.key === 'Enter' && !e.shiftKey) { e.preventDefault(); send(); }
});
</script>
</body>
</html>
"""
