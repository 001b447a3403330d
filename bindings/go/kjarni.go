// Package kjarni — Go binding over the kjarni C ABI (libkjarni.so).
//
// Rebuild of kjarni-ffi/bindings/go: the same surface (NewClassifier,
// NewEmbedder, NewChat, ...) via cgo against native/kjarni.h.
//
// Build: ensure libkjarni.so is on the linker path, then `go build`.
package kjarni

/*
#cgo LDFLAGS: -lkjarni
#include <stdlib.h>
#include "kjarni.h"
*/
import "C"

import (
	"encoding/json"
	"errors"
	"unsafe"
)

func init() {
	if C.kjarni_init() != 0 {
		panic("kjarni_init failed: " + lastError())
	}
}

func lastError() string {
	return C.GoString(C.kjarni_last_error())
}

// Version returns the native library version.
func Version() string {
	return C.GoString(C.kjarni_version())
}

type handle struct {
	h C.longlong
}

func newHandle(task, model string) (*handle, error) {
	opts := "{}"
	if model != "" {
		b, _ := json.Marshal(map[string]string{"model": model})
		opts = string(b)
	}
	ctask := C.CString(task)
	copts := C.CString(opts)
	defer C.free(unsafe.Pointer(ctask))
	defer C.free(unsafe.Pointer(copts))
	h := C.kjarni_new(ctask, copts)
	if h == 0 {
		return nil, errors.New(lastError())
	}
	return &handle{h: h}, nil
}

func (h *handle) call(method string, args any) (map[string]any, error) {
	b, err := json.Marshal(args)
	if err != nil {
		return nil, err
	}
	cm := C.CString(method)
	ca := C.CString(string(b))
	defer C.free(unsafe.Pointer(cm))
	defer C.free(unsafe.Pointer(ca))
	out := C.kjarni_call(h.h, cm, ca)
	if out == nil {
		return nil, errors.New(lastError())
	}
	defer C.kjarni_string_free(out)
	var result map[string]any
	if err := json.Unmarshal([]byte(C.GoString(out)), &result); err != nil {
		return nil, err
	}
	return result, nil
}

// Close frees the underlying native handle.
func (h *handle) Close() {
	if h.h != 0 {
		C.kjarni_free(h.h)
		h.h = 0
	}
}

// ---------------------------------------------------------------------------
// Classifier
// ---------------------------------------------------------------------------

type Classifier struct{ *handle }

type LabelScore struct {
	Label string
	Score float64
}

type ClassificationResult struct {
	Label     string
	Score     float64
	AllScores []LabelScore
}

func NewClassifier(model string) (*Classifier, error) {
	h, err := newHandle("classifier", model)
	if err != nil {
		return nil, err
	}
	return &Classifier{h}, nil
}

func parseClassification(out map[string]any) *ClassificationResult {
	res := &ClassificationResult{
		Label: out["label"].(string),
		Score: out["score"].(float64),
	}
	if raw, ok := out["all_scores"].([]any); ok {
		for _, pair := range raw {
			p := pair.([]any)
			res.AllScores = append(res.AllScores, LabelScore{
				Label: p[0].(string), Score: p[1].(float64)})
		}
	}
	return res
}

func (c *Classifier) Classify(text string) (*ClassificationResult, error) {
	out, err := c.call("classify", map[string]string{"text": text})
	if err != nil {
		return nil, err
	}
	return parseClassification(out), nil
}

// ClassifyBatch classifies many texts in one batched forward.
func (c *Classifier) ClassifyBatch(texts []string) ([]*ClassificationResult, error) {
	out, err := c.call("classify_batch", map[string]any{"texts": texts})
	if err != nil {
		return nil, err
	}
	var results []*ClassificationResult
	for _, item := range out["results"].([]any) {
		results = append(results, parseClassification(item.(map[string]any)))
	}
	return results, nil
}

// Labels returns the model's label set.
func (c *Classifier) Labels() ([]string, error) {
	out, err := c.call("labels", map[string]any{})
	if err != nil {
		return nil, err
	}
	var labels []string
	for _, l := range out["labels"].([]any) {
		labels = append(labels, l.(string))
	}
	return labels, nil
}

// ---------------------------------------------------------------------------
// Embedder
// ---------------------------------------------------------------------------

type Embedder struct{ *handle }

func NewEmbedder(model string) (*Embedder, error) {
	h, err := newHandle("embedder", model)
	if err != nil {
		return nil, err
	}
	return &Embedder{h}, nil
}

func (e *Embedder) Embed(text string) ([]float32, error) {
	out, err := e.call("embed", map[string]string{"text": text})
	if err != nil {
		return nil, err
	}
	raw := out["embedding"].([]any)
	vec := make([]float32, len(raw))
	for i, v := range raw {
		vec[i] = float32(v.(float64))
	}
	return vec, nil
}

// EmbedBatch embeds many texts in one batched forward.
func (e *Embedder) EmbedBatch(texts []string) ([][]float32, error) {
	out, err := e.call("embed_batch", map[string]any{"texts": texts})
	if err != nil {
		return nil, err
	}
	raw := out["embeddings"].([]any)
	vecs := make([][]float32, len(raw))
	for i, rv := range raw {
		row := rv.([]any)
		vec := make([]float32, len(row))
		for j, v := range row {
			vec[j] = float32(v.(float64))
		}
		vecs[i] = vec
	}
	return vecs, nil
}

func (e *Embedder) Similarity(a, b string) (float64, error) {
	out, err := e.call("similarity", map[string]string{"a": a, "b": b})
	if err != nil {
		return 0, err
	}
	return out["similarity"].(float64), nil
}

// Dim returns the embedding dimension.
func (e *Embedder) Dim() (int, error) {
	out, err := e.call("dim", map[string]any{})
	if err != nil {
		return 0, err
	}
	return int(out["dim"].(float64)), nil
}

// ---------------------------------------------------------------------------
// Chat
// ---------------------------------------------------------------------------

type Chat struct{ *handle }

func NewChat(model string) (*Chat, error) {
	h, err := newHandle("chat", model)
	if err != nil {
		return nil, err
	}
	return &Chat{h}, nil
}

func (c *Chat) Send(message string) (string, error) {
	out, err := c.call("send", map[string]string{"message": message})
	if err != nil {
		return "", err
	}
	return out["reply"].(string), nil
}

// ClearHistory resets the conversation (keeping the system prompt).
func (c *Chat) ClearHistory() error {
	_, err := c.call("clear_history", map[string]any{"keep_system": true})
	return err
}

// Stream sends a message and invokes fn per generated token; returning false
// cancels generation.
func (c *Chat) Stream(message string, fn func(token string) bool) error {
	return c.StreamWithCancel(message, nil, fn)
}

// StreamWithCancel streams with a CancelToken the engine checks each decode
// step (cf. kjarni-ffi callback.rs cancel tokens). token may be nil.
func (c *Chat) StreamWithCancel(message string, token *CancelToken,
	fn func(token string) bool) error {
	b, _ := json.Marshal(map[string]string{"message": message})
	return streamPull(c.handle, "stream", string(b), token, fn)
}

func streamPull(h *handle, method, args string, token *CancelToken,
	fn func(token string) bool) error {
	cm := C.CString(method)
	ca := C.CString(args)
	defer C.free(unsafe.Pointer(cm))
	defer C.free(unsafe.Pointer(ca))
	var th C.longlong
	if token != nil {
		th = token.h
	}
	if C.kjarni_stream_start_cancellable(h.h, cm, ca, th) != 0 {
		return errors.New(lastError())
	}
	for {
		tok := C.kjarni_stream_next(h.h)
		if tok == nil {
			return nil
		}
		s := C.GoString(tok)
		C.kjarni_string_free(tok)
		if !fn(s) {
			C.kjarni_stream_cancel(h.h)
			return nil
		}
	}
}

// ---------------------------------------------------------------------------
// CancelToken (kjarni-ffi callback.rs:52)
// ---------------------------------------------------------------------------

type CancelToken struct{ h C.longlong }

func NewCancelToken() (*CancelToken, error) {
	h := C.kjarni_cancel_token_new()
	if h == 0 {
		return nil, errors.New(lastError())
	}
	return &CancelToken{h: h}, nil
}

// Cancel requests cancellation; safe from any goroutine.
func (t *CancelToken) Cancel() { C.kjarni_cancel_token_cancel(t.h) }

func (t *CancelToken) Cancelled() bool {
	return C.kjarni_cancel_token_is_cancelled(t.h) != 0
}

func (t *CancelToken) Free() {
	if t.h != 0 {
		C.kjarni_cancel_token_free(t.h)
		t.h = 0
	}
}

// ---------------------------------------------------------------------------
// Generator
// ---------------------------------------------------------------------------

type Generator struct{ *handle }

func NewGenerator(model string) (*Generator, error) {
	h, err := newHandle("generator", model)
	if err != nil {
		return nil, err
	}
	return &Generator{h}, nil
}

// Generate produces text for a prompt. maxNewTokens <= 0 uses the default.
func (g *Generator) Generate(prompt string, maxNewTokens int) (string, error) {
	args := map[string]any{"prompt": prompt}
	if maxNewTokens > 0 {
		args["max_new_tokens"] = maxNewTokens
	}
	out, err := g.call("generate", args)
	if err != nil {
		return "", err
	}
	return out["text"].(string), nil
}

// GenerateStream invokes fn per generated token; returning false cancels.
func (g *Generator) GenerateStream(prompt string, token *CancelToken,
	fn func(token string) bool) error {
	b, _ := json.Marshal(map[string]string{"prompt": prompt})
	return streamPull(g.handle, "generate_stream", string(b), token, fn)
}

// ---------------------------------------------------------------------------
// Summarizer / Translator / Transcriber
// ---------------------------------------------------------------------------

type Summarizer struct{ *handle }

func NewSummarizer(model string) (*Summarizer, error) {
	h, err := newHandle("summarizer", model)
	if err != nil {
		return nil, err
	}
	return &Summarizer{h}, nil
}

func (s *Summarizer) Summarize(text string) (string, error) {
	out, err := s.call("summarize", map[string]string{"text": text})
	if err != nil {
		return "", err
	}
	return out["summary"].(string), nil
}

type Translator struct{ *handle }

func NewTranslator(model string) (*Translator, error) {
	h, err := newHandle("translator", model)
	if err != nil {
		return nil, err
	}
	return &Translator{h}, nil
}

func (t *Translator) Translate(text, from, to string) (string, error) {
	out, err := t.call("translate", map[string]string{
		"text": text, "from": from, "to": to})
	if err != nil {
		return "", err
	}
	return out["translation"].(string), nil
}

type Transcriber struct{ *handle }

type TranscriptSegment struct {
	Start float64
	End   float64
	Text  string
}

type Transcript struct {
	Text     string
	Duration float64
	Segments []TranscriptSegment
}

func NewTranscriber(model string) (*Transcriber, error) {
	h, err := newHandle("transcriber", model)
	if err != nil {
		return nil, err
	}
	return &Transcriber{h}, nil
}

func (t *Transcriber) TranscribeFile(path string) (*Transcript, error) {
	out, err := t.call("transcribe_file", map[string]string{"path": path})
	if err != nil {
		return nil, err
	}
	tr := &Transcript{
		Text:     out["text"].(string),
		Duration: out["duration"].(float64),
	}
	if segs, ok := out["segments"].([]any); ok {
		for _, sv := range segs {
			m := sv.(map[string]any)
			tr.Segments = append(tr.Segments, TranscriptSegment{
				Start: m["start"].(float64), End: m["end"].(float64),
				Text: m["text"].(string)})
		}
	}
	return tr, nil
}

// ---------------------------------------------------------------------------
// Reranker / Indexer / Searcher
// ---------------------------------------------------------------------------

type Reranker struct{ *handle }

type RerankResult struct {
	Index int
	Score float64
	Text  string
}

func NewReranker(model string) (*Reranker, error) {
	h, err := newHandle("reranker", model)
	if err != nil {
		return nil, err
	}
	return &Reranker{h}, nil
}

func (r *Reranker) Rerank(query string, documents []string) ([]RerankResult, error) {
	out, err := r.call("rerank", map[string]any{
		"query": query, "documents": documents})
	if err != nil {
		return nil, err
	}
	var results []RerankResult
	for _, item := range out["results"].([]any) {
		m := item.(map[string]any)
		results = append(results, RerankResult{
			Index: int(m["index"].(float64)),
			Score: m["score"].(float64),
			Text:  m["text"].(string),
		})
	}
	return results, nil
}

// Score scores a single query/document pair.
func (r *Reranker) Score(query, document string) (float64, error) {
	out, err := r.call("score", map[string]string{
		"query": query, "document": document})
	if err != nil {
		return 0, err
	}
	return out["score"].(float64), nil
}

// RerankTopK returns the k best documents.
func (r *Reranker) RerankTopK(query string, documents []string, k int) ([]RerankResult, error) {
	results, err := r.Rerank(query, documents)
	if err != nil {
		return nil, err
	}
	if k < len(results) {
		results = results[:k]
	}
	return results, nil
}

type Indexer struct{ *handle }

func NewIndexer(model string) (*Indexer, error) {
	h, err := newHandle("indexer", model)
	if err != nil {
		return nil, err
	}
	return &Indexer{h}, nil
}

func (i *Indexer) Create(indexPath string, paths []string) error {
	_, err := i.call("create", map[string]any{
		"index_path": indexPath, "paths": paths})
	return err
}

// Add appends documents to an existing index.
func (i *Indexer) Add(indexPath string, paths []string) error {
	_, err := i.call("add", map[string]any{
		"index_path": indexPath, "paths": paths})
	return err
}

type SearchMode string

const (
	Keyword  SearchMode = "keyword"
	Semantic SearchMode = "semantic"
	Hybrid   SearchMode = "hybrid"
)

type Searcher struct{ *handle }

type SearchResult struct {
	Score float64
	Text  string
}

func NewSearcher(model, rerankerModel string) (*Searcher, error) {
	h, err := newHandle("searcher", model)
	if err != nil {
		return nil, err
	}
	_ = rerankerModel // reranker model plumbed via options in a later revision
	return &Searcher{h}, nil
}

func (s *Searcher) Search(indexPath, query string, mode SearchMode) ([]SearchResult, error) {
	out, err := s.call("search", map[string]any{
		"index_path": indexPath, "query": query, "mode": string(mode)})
	if err != nil {
		return nil, err
	}
	var results []SearchResult
	for _, item := range out["results"].([]any) {
		m := item.(map[string]any)
		results = append(results, SearchResult{
			Score: m["score"].(float64), Text: m["text"].(string)})
	}
	return results, nil
}
