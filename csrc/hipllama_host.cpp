// Native host runtime: byte-fallback BPE tokenizer + samplers.
//
// The TPU framework's counterpart to the reference's C++ host layer
// (tokenizer at src/llama.cpp:34-256, sampler at :262-422): the device side
// is JAX/Pallas, but encode/sample sit on the host critical path of every
// request, so they are native here too. Exposed as a C ABI consumed via
// ctypes (hip_llama_tpu/native/__init__.py); behavior is specified by the
// Python implementations (tokenizer.py / sampler.py) and locked by parity
// tests.
//
// Build: g++ -O2 -fPIC -shared csrc/hipllama_host.cpp -o hipllama_host.so

#include <algorithm>
#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <string>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Tokenizer

struct Tokenizer {
  std::vector<std::string> vocab;
  std::vector<float> scores;
  std::unordered_map<std::string, int> lookup;  // highest score wins
  uint32_t max_token_length = 0;
};

// tokenizer.bin format (written by the reference's train/tokenizer.py:62-70):
// int32 max_token_length, then per token: float32 score, int32 len, bytes.
void* tok_load(const char* path, int vocab_size) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  Tokenizer* t = new Tokenizer();
  if (fread(&t->max_token_length, 4, 1, f) != 1) { fclose(f); delete t; return nullptr; }
  t->vocab.reserve(vocab_size);
  t->scores.reserve(vocab_size);
  for (int i = 0; i < vocab_size; i++) {
    float score; int32_t len;
    if (fread(&score, 4, 1, f) != 1 || fread(&len, 4, 1, f) != 1) break;
    std::string s(len, '\0');
    if (len && fread(&s[0], 1, len, f) != (size_t)len) break;
    t->scores.push_back(score);
    t->vocab.push_back(s);
    // duplicates: keep the highest-scoring id (tokenizer.py semantics)
    auto it = t->lookup.find(s);
    if (it == t->lookup.end() || score > t->scores[it->second]) t->lookup[s] = i;
  }
  fclose(f);
  if ((int)t->vocab.size() != vocab_size) { delete t; return nullptr; }
  return t;
}

void* tok_from_buffers(const uint8_t* blob, const int32_t* lens,
                       const float* scores, int vocab_size) {
  Tokenizer* t = new Tokenizer();
  size_t off = 0;
  t->vocab.reserve(vocab_size);
  for (int i = 0; i < vocab_size; i++) {
    std::string s((const char*)blob + off, (size_t)lens[i]);
    off += lens[i];
    t->scores.push_back(scores[i]);
    if (s.size() > t->max_token_length) t->max_token_length = s.size();
    t->vocab.push_back(s);
    auto it = t->lookup.find(s);
    if (it == t->lookup.end() || scores[i] > t->scores[it->second])
      t->lookup[s] = i;
  }
  return t;
}

void tok_free(void* p) { delete (Tokenizer*)p; }

static int find_token(Tokenizer* t, const std::string& s) {
  auto it = t->lookup.find(s);
  return it == t->lookup.end() ? -1 : it->second;
}

// Greedy best-score pair merging over an initial UTF-8 codepoint / byte-
// fallback split. Same algorithm family as SentencePiece BPE; semantics
// locked to tokenizer.py::Tokenizer.encode by the parity tests.
int tok_encode(void* p, const char* text, int n_text, int bos, int eos,
               int* out, int max_out) {
  Tokenizer* t = (Tokenizer*)p;
  std::vector<int> ids;
  if (bos) ids.push_back(1);
  const std::string s(text, (size_t)n_text);
  if (!s.empty()) {
    // add_dummy_prefix: the " " TOKEN, if present (tokenizer.py semantics)
    int dummy = find_token(t, " ");
    if (dummy >= 0) ids.push_back(dummy);
    // codepoint split: absorb up to 3 continuation bytes (0b10xxxxxx),
    // byte fallback (+3 past <unk>/<s>/</s>) for unknown chunks
    size_t i = 0;
    while (i < s.size()) {
      size_t j = i + 1;
      while (j < s.size() && ((uint8_t)s[j] & 0xC0) == 0x80 && (j - i) < 4) j++;
      std::string piece = s.substr(i, j - i);
      int id = find_token(t, piece);
      if (id >= 0) {
        ids.push_back(id);
      } else {
        for (char ch : piece) ids.push_back((uint8_t)ch + 3);
      }
      i = j;
    }
    // greedy merges: repeatedly merge the adjacent pair with the best score
    while (ids.size() >= 2) {
      float best_score = -1e10f;
      int best_idx = -1, best_id = -1;
      for (size_t j = 0; j + 1 < ids.size(); j++) {
        std::string cat = t->vocab[ids[j]] + t->vocab[ids[j + 1]];
        int id = find_token(t, cat);
        if (id >= 0 && t->scores[id] > best_score) {
          best_score = t->scores[id];
          best_idx = (int)j;
          best_id = id;
        }
      }
      if (best_idx < 0) break;
      ids[best_idx] = best_id;
      ids.erase(ids.begin() + best_idx + 1);
    }
  }
  if (eos) ids.push_back(2);
  int n = (int)ids.size();
  if (n > max_out) n = max_out;
  memcpy(out, ids.data(), n * sizeof(int));
  return (int)ids.size();
}

// piece for (prev, token): strips the leading space after BOS and maps
// <0xXX> byte tokens (llama.cpp:85-96 behavior).
int tok_decode_piece(void* p, int prev, int token, uint8_t* out, int max_out) {
  Tokenizer* t = (Tokenizer*)p;
  if (token < 0 || token >= (int)t->vocab.size()) return 0;
  const std::string* piece = &t->vocab[token];
  std::string tmp;
  if (prev == 1 && !piece->empty() && (*piece)[0] == ' ') {
    tmp = piece->substr(1);
    piece = &tmp;
  }
  // raw byte token of the form "<0xXX>" — EXACTLY two hex digits, like
  // tokenizer.py's ^<0x([0-9A-Fa-f]{2})>$ (sscanf "%02X" would accept a
  // single digit and diverge from the Python path on malformed pieces)
  if (piece->size() == 6 && piece->compare(0, 3, "<0x") == 0 &&
      (*piece)[5] == '>' && isxdigit((unsigned char)(*piece)[3]) &&
      isxdigit((unsigned char)(*piece)[4])) {
    unsigned int byte = 0;
    sscanf(piece->c_str() + 3, "%02X", &byte);
    if (max_out < 1) return 0;
    out[0] = (uint8_t)byte;
    return 1;
  }
  int n = (int)piece->size();
  if (n > max_out) n = max_out;
  memcpy(out, piece->data(), n);
  return n;
}

// ---------------------------------------------------------------------------
// Sampler: xorshift64* RNG + argmax / multinomial / top-p. Bit-compatible
// with sampler.py (same f32 accumulation order), which itself reproduces
// the reference RNG (llama.cpp:365-374).

uint64_t rng_next_u64(uint64_t* state) {
  uint64_t s = *state;
  s ^= s >> 12;
  s ^= s << 25;
  s ^= s >> 27;
  *state = s;
  return s;
}

static uint32_t random_u32(uint64_t* state) {
  return (uint32_t)((rng_next_u64(state) * 0x2545F4914F6CDD1DULL) >> 32);
}

static float random_f32(uint64_t* state) {
  return (float)(random_u32(state) >> 8) / 16777216.0f;
}

static int sample_argmax(const float* p, int n) {
  int best = 0;
  float bv = p[0];
  for (int i = 1; i < n; i++)
    if (p[i] > bv) { bv = p[i]; best = i; }
  return best;
}

int sample_token(float* logits, int n, float temperature, float topp,
                 uint64_t* rng_state) {
  if (temperature == 0.0f) return sample_argmax(logits, n);
  // softmax(logits / T) in f32
  std::vector<float> probs(n);
  float maxv = -1e30f;
  for (int i = 0; i < n; i++) {
    probs[i] = logits[i] / temperature;
    if (probs[i] > maxv) maxv = probs[i];
  }
  float sum = 0.f;
  for (int i = 0; i < n; i++) { probs[i] = expf(probs[i] - maxv); sum += probs[i]; }
  for (int i = 0; i < n; i++) probs[i] /= sum;
  float coin = random_f32(rng_state);
  if (topp <= 0.f || topp >= 1.f) {
    // multinomial: inverse CDF
    float cdf = 0.f;
    for (int i = 0; i < n; i++) {
      cdf += probs[i];
      if (coin < cdf) return i;
    }
    return n - 1;
  }
  // top-p with cutoff pre-filter (sampler.py::sample_topp semantics)
  float cutoff = (1.0f - topp) / (n - 1);
  std::vector<std::pair<float, int>> cand;
  cand.reserve(256);
  for (int i = 0; i < n; i++)
    if (probs[i] >= cutoff) cand.push_back({probs[i], i});
  if (cand.empty()) return sample_argmax(probs.data(), n);
  // stable sort by descending prob (ties keep index order)
  std::stable_sort(cand.begin(), cand.end(),
                   [](const std::pair<float, int>& a, const std::pair<float, int>& b) {
                     return a.first > b.first;
                   });
  int last = (int)cand.size() - 1;
  float cum = 0.f;
  for (size_t i = 0; i < cand.size(); i++) {
    cum += cand[i].first;
    if (cum > topp) { last = (int)i; break; }
  }
  float r = coin * cum;
  float c2 = 0.f;
  for (int i = 0; i <= last; i++) {
    c2 += cand[i].first;
    if (r < c2) return cand[i].second;
  }
  return cand[last].second;
}

// ---------------------------------------------------------------------------
// Continuous-batching slot state machine — the scheduler half of the
// reference's test_data_parallelism loop (llama.cpp:968-1073): per-slot
// prompt force-feed, per-request fixed-seed sampling, BOS/EOS/length
// retirement. The per-token host work runs here in native code; the Python
// engine keeps orchestration (prefill batching, request IO, metrics) — the
// same split the reference has between its C++ loop and its shell scripts.

struct SchedSlot {
  int req = -1;
  std::vector<int> prompt;
  int pos = 0;
  int token = 0;
  int max_steps = 0;
  float temp = 1.0f, topp = 0.9f;
  uint64_t rng = 0;
};

struct Sched {
  int b = 0, vocab = 0;
  std::vector<SchedSlot> slots;
};

void* sched_create(int n_slots, int vocab) {
  Sched* s = new Sched();
  s->b = n_slots;
  s->vocab = vocab;
  s->slots.resize(n_slots);
  return s;
}

void sched_free(void* p) { delete (Sched*)p; }

void sched_bind(void* p, int slot, int req, const int* prompt, int n_prompt,
                int pos, int token, int max_steps, float temp, float topp,
                uint64_t rng_state) {
  SchedSlot& sl = ((Sched*)p)->slots[slot];
  sl.req = req;
  sl.prompt.assign(prompt, prompt + n_prompt);
  sl.pos = pos;
  sl.token = token;
  sl.max_steps = max_steps;
  sl.temp = temp;
  sl.topp = topp;
  sl.rng = rng_state;
}

void sched_release(void* p, int slot) { ((Sched*)p)->slots[slot].req = -1; }

// One post-step advance over all slots. `logits` = the (B, vocab) f32 step
// output (read-only), or NULL when `sampled`
// carries on-device-sampled tokens. Per-slot outputs: feed_tok/feed_pos for
// the next device step; done=1 if the slot retires this step; emit_prev/
// emit_next = the token pair whose decoded piece appends to the generation
// (-1 = nothing). Bit-compatible with the Python loop in engine.serve.
int sched_advance(void* p, float* logits, const int* sampled, int* feed_tok,
                  int* feed_pos, int* done, int* emit_prev, int* emit_next,
                  int bos_id, int eos_id) {
  Sched* s = (Sched*)p;
  int active = 0;
  for (int i = 0; i < s->b; i++) {
    SchedSlot& sl = s->slots[i];
    done[i] = 0;
    emit_prev[i] = -1;
    emit_next[i] = -1;
    if (sl.req < 0) {
      feed_tok[i] = 0;
      feed_pos[i] = 0;
      continue;
    }
    active++;
    int nxt;
    int n_prompt = (int)sl.prompt.size();
    if (sl.pos < n_prompt - 1) {
      nxt = sl.prompt[sl.pos + 1];
    } else if (sampled) {
      nxt = sampled[i];
    } else {
      nxt = sample_token(logits + (size_t)i * s->vocab, s->vocab, sl.temp,
                         sl.topp, &sl.rng);
    }
    sl.pos += 1;
    if (nxt == bos_id || nxt == eos_id) {
      done[i] = 1;
    } else {
      emit_prev[i] = sl.token;
      emit_next[i] = nxt;
      sl.token = nxt;
      if (sl.pos >= sl.max_steps) done[i] = 1;
    }
    feed_tok[i] = sl.token;
    feed_pos[i] = sl.pos;
  }
  return active;
}

}  // extern "C"
